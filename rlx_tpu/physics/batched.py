"""Batch-last small-linear-algebra helpers for the physics engine.

TPU lane-occupancy rationale: arrays shaped ``[B, 14, 6]`` put tiny dims on
the (8, 128) vector tiles — ~7% lane utilization, which measured out to a
~10x slowdown of the whole engine.  Everything here uses the transposed
layout ``[comp..., B]``: the env batch lives in the last (lane) dimension,
small structural dims (3/6/nv) are leading and unrolled, and every op
lowers to full-width [B]-wide VPU multiply-adds that XLA fuses.

Contractions are written as broadcast-multiply + sum over a *leading* axis
on purpose — einsum/dot_general would relayout to put the batch dim first.
"""

import jax.numpy as jnp
import numpy as np


def matmul(A, B):
    """[m, k, B] @ [k, n, B] -> [m, n, B]."""
    return (A[:, :, None, :] * B[None, :, :, :]).sum(1)


def matmul_const(A, C):
    """[m, k, B] @ const [k, n] -> [m, n, B]."""
    return (A[:, :, None, :] * C[None, :, :, None]).sum(1)


def const_matmul(C, B):
    """const [m, k] @ [k, n, B] -> [m, n, B]."""
    return (C[:, :, None, None] * B[None, :, :, :]).sum(1)


def matvec(A, v):
    """[m, k, B] @ [k, B] -> [m, B]."""
    return (A * v[None, :, :]).sum(1)


def matvec_const(A, c):
    """[m, k, B] @ const [k] -> [m, B]."""
    return (A * c[None, :, None]).sum(1)


def transpose(A):
    return jnp.swapaxes(A, 0, 1)


def cross(a, b):
    """[3, B] x [3, B] -> [3, B]."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def skew(v):
    """[3, B] -> [3, 3, B]."""
    zero = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[2], v[1]]),
            jnp.stack([v[2], zero, -v[0]]),
            jnp.stack([-v[1], v[0], zero]),
        ]
    )


def cross_motion(v, m):
    """Spatial motion cross product v x m; both [6, B] motion vectors
    ((angular, linear) world-origin Plücker).  Equals crm(v) @ m without
    materializing the [6, 6, B] matrix."""
    w, vl = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return jnp.concatenate([cross(w, mw), cross(w, mv) + cross(vl, mw)])


def cross_force(v, f):
    """Spatial force cross product v x* f; v [6, B] motion, f [6, B] force
    ((moment, linear force)).  Equals -crm(v)^T @ f."""
    w, vl = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([cross(w, n) + cross(vl, fl), cross(w, fl)])


def quat_to_rot(q):
    """[4, B] (w, x, y, z) -> [3, 3, B]."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
        ]
    )


def quat_mul(a, b):
    """[4, B] Hamilton product."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_integrate(q, omega_local, dt):
    """[4, B], [3, B] -> [4, B]; omega in the body frame."""
    speed = jnp.sqrt((omega_local**2).sum(0))
    angle = speed * dt
    half = 0.5 * angle
    axis = omega_local / jnp.maximum(speed, 1e-9)[None]
    dq = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]])
    out = quat_mul(q, dq)
    return out / jnp.sqrt((out**2).sum(0))[None]


def rodrigues(axis, angle):
    """const axis [3], angle [B] -> [3, 3, B] rotation about the axis."""
    return rodrigues_sc(axis, jnp.sin(angle), jnp.cos(angle))


def rodrigues_sc(axis, s, c):
    """Rodrigues rotation from precomputed sin/cos [B] (lets the caller
    batch ALL joint angles' trig into one [n_hinge, B] sin + cos pair
    instead of 2 ops per joint — fewer kernels on the fragmentation-bound
    FK path, see benchmarks/ROOFLINE.md round 5)."""
    K = np.array(
        [
            [0.0, -float(axis[2]), float(axis[1])],
            [float(axis[2]), 0.0, -float(axis[0])],
            [-float(axis[1]), float(axis[0]), 0.0],
        ],
        dtype=np.float32,
    )
    KK = K @ K
    eye = np.eye(3, dtype=np.float32)
    return eye[:, :, None] + s[None, None, :] * K[:, :, None] + (1.0 - c)[None, None, :] * KK[:, :, None]


def ltdl_solve(M, rhs, lam):
    """Tree-sparse M x = rhs solve via the LTDL factorization
    (M = L^T D L, Featherstone RBDA §6.5 — the algorithm MuJoCo's
    mj_factorM/mj_solveM implement).  ``lam`` is the static parent-dof
    array (lam[d] = preceding dof on d's kinematic chain, -1 at the root);
    for kinematic trees the factorization has ZERO fill-in outside the
    ancestor chains, so both factor and solve touch only
    sum_k |ancestors(k)| entries — ~4x fewer [B]-wide madds than the dense
    Cholesky on branchy robots (ant: 231 vs 915).

    M: [n, n, B] (only chain entries are read), rhs: [n, B] -> [n, B].
    """
    n = M.shape[0]
    H = {}
    for k in range(n):
        j = k
        while j != -1:
            H[(k, j)] = M[k, j]
            j = int(lam[j])
    inv_d = [None] * n
    for k in reversed(range(n)):
        inv_d[k] = 1.0 / H[(k, k)]
        i = int(lam[k])
        while i != -1:
            a = H[(k, i)] * inv_d[k]
            j = i
            while j != -1:
                H[(i, j)] = H[(i, j)] - a * H[(k, j)]
                j = int(lam[j])
            H[(k, i)] = a
            i = int(lam[i])
    # x = L^{-1} D^{-1} L^{-T} rhs
    x = [rhs[k] for k in range(n)]
    for i in reversed(range(n)):
        j = int(lam[i])
        while j != -1:
            x[j] = x[j] - H[(i, j)] * x[i]
            j = int(lam[j])
    x = [x[k] * inv_d[k] for k in range(n)]
    for i in range(n):
        j = int(lam[i])
        while j != -1:
            x[i] = x[i] - H[(i, j)] * x[j]
            j = int(lam[j])
    return jnp.stack(x)


def cholesky_solve(M, rhs):
    """Solve M x = rhs for SPD M.  M: [n, n, B], rhs: [n, B] -> [n, B].

    Column-vectorized Cholesky + triangular solves as [B]-wide vector ops
    (n <= ~20; n=14 for the ant).  Avoids XLA's batched LAPACK path (which
    relayouts to batch-first) and keeps the traced-op count ~O(n) columns
    rather than O(n^3) scalars — lowering over the hosted-TPU tunnel is
    per-op expensive.
    """
    n = M.shape[0]
    B = M.shape[-1]
    L = jnp.zeros((n, n, B), M.dtype)
    inv_diag = jnp.zeros((n, B), M.dtype)
    for j in range(n):
        # s[j:] = M[j:, j] - L[j:, :j] @ L[j, :j]
        if j > 0:
            dot = (L[j:, :j] * L[j, :j][None]).sum(1)
        else:
            dot = 0.0
        s_col = M[j:, j] - dot                     # [n - j, B]
        diag = jnp.sqrt(s_col[0])
        inv = 1.0 / diag
        col = jnp.concatenate([diag[None], s_col[1:] * inv[None]]) if j < n - 1 else diag[None]
        L = L.at[j:, j].set(col)
        inv_diag = inv_diag.at[j].set(inv)
    # forward substitution: L y = rhs
    y = jnp.zeros((n, B), M.dtype)
    for i in range(n):
        dot = (L[i, :i] * y[:i]).sum(0) if i > 0 else 0.0
        y = y.at[i].set((rhs[i] - dot) * inv_diag[i])
    # back substitution: L^T x = y
    x = jnp.zeros((n, B), M.dtype)
    for i in reversed(range(n)):
        dot = (L[i + 1:, i] * x[i + 1:]).sum(0) if i < n - 1 else 0.0
        x = x.at[i].set((y[i] - dot) * inv_diag[i])
    return x
