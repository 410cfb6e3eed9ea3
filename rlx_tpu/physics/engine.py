"""Batched forward dynamics + integrator (pure JAX, batch-last layout).

Formulation: world-frame, world-origin-referenced spatial algebra.
Per substep:

1. forward kinematics (python loop over the static tree, parents first);
2. world Jacobian columns per dof: hinge ``[a; x_anchor x a]``, free joint
   ``[0; e_k]`` + ``[a_k; p x a_k]`` with MuJoCo's free-joint convention
   (linear velocity world, angular velocity body-local);
3. mass matrix via CRBA over the static tree: composite world inertias
   bottom-up, M[d, j] = S_j^T I^C_{body(d)} S_d for (dof, ancestor-dof)
   pairs only (+ armature on the diagonal) — the structurally-zero
   entries of branchy robots are never computed;
4. bias forces via the velocity-product recursion
   zeta_i = zeta_parent + v_i x (S_i^moving qd_i),  f_i = I zeta + v x* I v,
   with gravity folded in as base acceleration  zeta_root = [0; -g]
   (for the free joint only the child-fixed angular columns contribute to
   the velocity-product term — the world-aligned linear columns are
   constant); generalized bias/contact torques come from one RNEA-style
   backward accumulation of world wrenches up the tree;
5. penalty contacts (sphere/capsule-endpoint vs plane z=0): critically
   damped spring-damper from per-contact effective mass + smooth Coulomb
   friction;
6. actuators: position servo  clip(kp (ctrl - q) - kv qd)  or torque motor;
   passive -damping qd - frictionloss tanh(qd/0.05); joint-limit springs;
7. qacc = M^{-1} (tau - C) via an unrolled batch-last tree-sparse LTDL
   factorization (zero fill-in outside ancestor chains, as MuJoCo's
   mj_factorM); semi-implicit Euler with quaternion integration for the
   free joint.

PERFORMANCE: all internal state is ``[comp..., B]`` (batch last) so the env
batch fills the TPU's 128-wide lanes; structural dims (3/6/nv<=15) are
static and unrolled.  The first ``[B, small, small]`` version of this file
measured ~9 ms per substep at B=4096 on one v5e chip (~10x lane waste);
see rlx_tpu/physics/batched.py for the layout rationale.

Public API stays batch-first: qpos [B, nq], qvel [B, nv], ctrl [B, nu].

Validated against MuJoCo C: mass matrix (mj_fullM), bias (qfrc_bias), and
smooth-dynamics qacc in tests/test_physics.py.  The contact model is an
intentional departure from MuJoCo's solver (soft penalty, brax-style) —
solver-based contact does not map onto fused TPU batch programs.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.physics import batched as bl
from rlx_tpu.physics.model import FREE, HINGE, PhysicsModel


class DomainParams(NamedTuple):
    """Per-env runtime physics randomization (batch-last, ``[..., B]``).

    TPU-native replacement for the reference's per-env mjx_model rewrites
    (`robot_locomotion/mjx/domain_randomization/*`): instead of carrying a
    whole randomized model pytree per env, the engine consumes small per-env
    multiplier arrays that enter the dynamics as elementwise scales — free
    next to the [nv, nv, B] mass-matrix work.  Every field is optional;
    ``None`` means "use the compiled constant".
    """

    mass_scale: Optional[jax.Array] = None          # [nbody, B] inertia+mass
    damping_scale: Optional[jax.Array] = None       # [B] joint damping
    frictionloss_scale: Optional[jax.Array] = None  # [B] dry friction
    armature_scale: Optional[jax.Array] = None      # [B] rotor armature
    friction_scale: Optional[jax.Array] = None      # [B] contact friction mu
    contact_stiffness_scale: Optional[jax.Array] = None  # [B] penalty omega
    kp_scale: Optional[jax.Array] = None            # [nu, B] P gain
    kv_scale: Optional[jax.Array] = None            # [nu, B] D gain
    forcerange_scale: Optional[jax.Array] = None    # [nu, B] torque limit
    ctrl_offset: Optional[jax.Array] = None         # [nu, B] servo zero shift
    gravity: Optional[jax.Array] = None             # [3, B] gravity vector


class Terrain(NamedTuple):
    """Per-env square heightfield for ground contact (batch-last).

    ``height`` is ``[n*n, B]`` (row-major ``[iy, ix]``), covering
    x,y in ``[-half_extent_m, half_extent_m]``; lookups are nearest-cell like
    the reference hfield (`robot_locomotion/mjx/terrain_functions/
    hfield_diverse.py:69-72`).  ``None`` terrain = plane z=0.
    """

    height: jax.Array
    n: int
    half_extent_m: float


def terrain_height_T(terrain: Terrain, x, y):
    """Nearest-cell terrain height at world (x, y); inputs/outputs [..., B]."""
    n = terrain.n
    cells_per_m = n / (2.0 * terrain.half_extent_m)
    ix = jnp.clip(jnp.round(x * cells_per_m + n // 2).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(jnp.round(y * cells_per_m + n // 2).astype(jnp.int32), 0, n - 1)
    flat = (iy * n + ix).reshape(-1, x.shape[-1])                 # [K, B]
    h = jnp.take_along_axis(terrain.height, flat, axis=0)         # [K, B]
    return h.reshape(x.shape)


def _dof_structure(model: PhysicsModel):
    """Static dof-tree structure (trace-time numpy):

    - ``lam[d]``: the preceding dof on d's kinematic chain (-1 at the root) —
      within a free joint the 6 dofs chain linearly; the first dof of a
      joint chains to the last dof of the nearest jointed ancestor body;
    - ``dof_body[d]``: the body the dof belongs to.

    This is the sparsity pattern CRBA, the RNEA-style backward force
    projection, and the LTDL solve all share: M[i, j] != 0 iff one of i, j
    is on the other's lam-chain.
    """
    lam = np.full(model.nv, -1, dtype=np.int64)
    dof_body = np.zeros(model.nv, dtype=np.int64)
    last_dof = np.full(model.nbody, -1, dtype=np.int64)
    for i in range(model.nbody):
        par = int(model.parent[i])
        prev = int(last_dof[par]) if par != -1 else -1
        jt = int(model.jnt_type[i])
        d = int(model.dof_adr[i])
        if jt == FREE:
            for k in range(6):
                lam[d + k] = prev
                dof_body[d + k] = i
                prev = d + k
            last_dof[i] = d + 5
        elif jt == HINGE:
            lam[d] = prev
            dof_body[d] = i
            last_dof[i] = d
        else:
            last_dof[i] = prev  # jointless body: chain passes through
    return lam, dof_body


def _kinematics_T(model: PhysicsModel, qposT):
    """FK in batch-last layout: qposT [nq, B] -> (Rs, ps) lists of
    ([3, 3, B], [3, B]) per body."""
    B = qposT.shape[-1]
    Rs, ps = [], []
    eye = jnp.broadcast_to(np.eye(3, dtype=np.float32)[:, :, None], (3, 3, B))
    zero3 = jnp.zeros((3, B))
    # Batch ALL hinge angles' trig into one sin + one cos over [n_hinge, B]
    # (the per-joint sin/cos pairs were 2 kernels each on the
    # fragmentation-bound FK path; the angles are chain-independent).
    hinge_bodies = [
        i for i in range(model.nbody) if int(model.jnt_type[i]) == HINGE
    ]
    trig = {}
    if hinge_bodies:
        # static slices (not a gather) so the same body lowers in Mosaic
        angles = jnp.stack([qposT[int(model.qpos_adr[i])] for i in hinge_bodies])
        sins, coss = jnp.sin(angles), jnp.cos(angles)
        trig = {i: (sins[k], coss[k]) for k, i in enumerate(hinge_bodies)}
    for i in range(model.nbody):
        par = int(model.parent[i])
        Rp, pp = (Rs[par], ps[par]) if par != -1 else (eye, zero3)
        R_off = np.asarray(model.body_quat[i])
        # constant quaternion -> constant rotation matrix (host-side)
        w, x, y, z = R_off
        C = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ],
            dtype=np.float32,
        )
        R_frame = Rp if np.allclose(C, np.eye(3)) else bl.matmul_const(Rp, C)
        p_frame = pp + bl.matvec_const(Rp, np.asarray(model.body_pos[i]))
        jt = int(model.jnt_type[i])
        if jt == FREE:
            qa = int(model.qpos_adr[i])
            p = qposT[qa: qa + 3]
            R = bl.quat_to_rot(qposT[qa + 3: qa + 7])
        elif jt == HINGE:
            s, c = trig[i]
            R_axis = bl.rodrigues_sc(np.asarray(model.jnt_axis[i]), s, c)
            R = bl.matmul(R_frame, R_axis)
            anchor = np.asarray(model.jnt_pos[i])
            p = p_frame + bl.matvec_const(R_frame - R, anchor)
        else:
            R, p = R_frame, p_frame
        Rs.append(R)
        ps.append(p)
    return Rs, ps


def _jacobian_columns_T(model: PhysicsModel, Rs, ps):
    """[nv, 6, B] world-origin Plücker columns."""
    B = ps[0].shape[-1]
    cols = [None] * model.nv
    zeros = jnp.zeros((3, B))
    for i in range(model.nbody):
        jt = int(model.jnt_type[i])
        if jt == FREE:
            d = int(model.dof_adr[i])
            for k in range(3):  # linear dofs, world axes
                e = zeros.at[k].set(1.0)
                cols[d + k] = jnp.concatenate([zeros, e])
            for k in range(3):  # angular dofs, body-local axes
                a = Rs[i][:, k]
                cols[d + 3 + k] = jnp.concatenate([a, bl.cross(ps[i], a)])
        elif jt == HINGE:
            d = int(model.dof_adr[i])
            a = bl.matvec_const(Rs[i], np.asarray(model.jnt_axis[i]))
            anchor = ps[i] + bl.matvec_const(Rs[i], np.asarray(model.jnt_pos[i]))
            cols[d] = jnp.concatenate([a, bl.cross(anchor, a)])
    return jnp.stack(cols)


def _spatial_inertia_T(model: PhysicsModel, i, R, p):
    """[6, 6, B] world-origin spatial inertia of body i."""
    w, x, y, z = np.asarray(model.body_iquat[i])
    C = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    R_icom = bl.matmul_const(R, C)
    I_diag = np.asarray(model.body_inertia[i])  # principal moments
    # I_c = R_icom diag(I) R_icom^T
    scaled = R_icom * I_diag[None, :, None]
    I_c = bl.matmul(scaled, bl.transpose(R_icom))
    com = p + bl.matvec_const(R, np.asarray(model.body_ipos[i]))
    c = bl.skew(com)
    m = float(model.body_mass[i])
    top_left = I_c + m * bl.matmul(c, bl.transpose(c))
    top_right = m * c
    bottom_left = m * bl.transpose(c)
    eyeB = jnp.broadcast_to(np.eye(3, dtype=np.float32)[:, :, None], c.shape)
    bottom_right = m * eyeB
    top = jnp.concatenate([top_left, top_right], axis=1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def mass_matrix_bias(model: PhysicsModel, qpos, qvel):
    """Diagnostics/testing API: (M [B, nv, nv] incl. armature, C [B, nv])."""
    qposT = qpos.T
    qvelT = qvel.T
    M, f_bias, Rs, ps, v_list, cols = _dynamics_T(model, qposT, qvelT)
    _, dof_body = _dof_structure(model)
    C = _backward_project_T(model, cols, f_bias, dof_body)
    return jnp.transpose(M, (2, 0, 1)), C.T


def _crba_M_T(model: PhysicsModel, cols, I_list, lam, dof_body):
    """Composite-rigid-body mass matrix [nv, nv, B] (excl. armature).

    Identical sum to per-body J^T I J accumulation, regrouped so only the
    structurally-nonzero (dof, ancestor-dof) entries are computed: composite
    world inertias I^C bottom-up, then M[d, j] = S_j^T I^C_{body(d)} S_d.
    On the ant this is ~15x fewer [B]-wide madds than the dense masked
    accumulation this replaced (measured round 5, see benchmarks/ROOFLINE.md).
    """
    B = cols.shape[-1]
    Ic = list(I_list)
    for i in range(model.nbody - 1, 0, -1):
        par = int(model.parent[i])
        Ic[par] = Ic[par] + Ic[i]
    entries = {}
    for d in range(model.nv):
        F = bl.matvec(Ic[int(dof_body[d])], cols[d])      # [6, B]
        j = d
        while j != -1:
            entries[(d, j)] = (cols[j] * F).sum(0)        # [B]
            j = int(lam[j])
    zero = jnp.zeros((B,))
    rows = []
    for i in range(model.nv):
        row = []
        for j in range(model.nv):
            e = entries.get((i, j))
            if e is None:
                e = entries.get((j, i))
            row.append(zero if e is None else e)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _backward_project_T(model: PhysicsModel, cols, f_list, dof_body):
    """RNEA-style backward pass: accumulate per-body world wrenches up the
    tree, then project onto each dof's own axis — tau[d] = S_d^T f^tot_{b(d)}
    ([nv, B]).  Equivalent to summing S_d^T f_b over every descendant body b
    (what the dense masked-Jacobian projection computed), at 6 madds/dof."""
    f_tot = list(f_list)
    for i in range(model.nbody - 1, 0, -1):
        par = int(model.parent[i])
        f_tot[par] = f_tot[par] + f_tot[i]
    return jnp.stack(
        [(cols[d] * f_tot[int(dof_body[d])]).sum(0) for d in range(model.nv)]
    )


def _dynamics_T(model: PhysicsModel, qposT, qvelT, dr: Optional[DomainParams] = None):
    """Core: returns (M [nv, nv, B] incl. armature, f_bias per-body list of
    [6, B] world bias wrenches, Rs, ps, v list, cols)."""
    B = qposT.shape[-1]
    lam, dof_body = _dof_structure(model)
    Rs, ps = _kinematics_T(model, qposT)
    cols = _jacobian_columns_T(model, Rs, ps)  # [nv, 6, B]

    g = np.asarray(model.gravity)
    if dr is not None and dr.gravity is not None:
        zeta0 = jnp.concatenate([jnp.zeros((3, B)), -dr.gravity])
    else:
        zeta0 = jnp.concatenate([jnp.zeros((3, B)), jnp.broadcast_to((-g.astype(np.float32))[:, None], (3, B))])

    v_list = [None] * model.nbody
    zeta_list = [None] * model.nbody
    I_list = [None] * model.nbody
    f_bias = [None] * model.nbody
    zero6 = jnp.zeros((6, B))

    for i in range(model.nbody):
        par = int(model.parent[i])
        v_par = v_list[par] if par != -1 else zero6
        z_par = zeta_list[par] if par != -1 else zeta0
        jt = int(model.jnt_type[i])
        d = int(model.dof_adr[i])
        if jt == FREE:
            own = (cols[d: d + 6] * qvelT[d: d + 6, None, :]).sum(0)
            own_moving = (cols[d + 3: d + 6] * qvelT[d + 3: d + 6, None, :]).sum(0)
        elif jt == HINGE:
            own = cols[d] * qvelT[d][None]
            own_moving = own
        else:
            own = own_moving = zero6
        v_i = v_par + own
        zeta_i = z_par + bl.cross_motion(v_i, own_moving)
        v_list[i] = v_i
        zeta_list[i] = zeta_i

        I_w = _spatial_inertia_T(model, i, Rs[i], ps[i])  # [6, 6, B]
        if dr is not None and dr.mass_scale is not None:
            I_w = I_w * dr.mass_scale[i]
        I_list[i] = I_w

        Iv = bl.matvec(I_w, v_i)
        f_bias[i] = bl.matvec(I_w, zeta_i) + bl.cross_force(v_i, Iv)

    M = _crba_M_T(model, cols, I_list, lam, dof_body)
    armature = np.diag(model.dof_armature).astype(np.float32)[:, :, None]
    if dr is not None and dr.armature_scale is not None:
        armature = armature * dr.armature_scale
    M = M + armature
    return M, f_bias, Rs, ps, v_list, cols


def contact_points_T(model, qposT):
    """World xy of every engine contact point, [ncon, 2, B] (anchor init)."""
    Rs, ps = _kinematics_T(model, qposT)
    points = []
    for c in range(len(model.con_body)):
        b = int(model.con_body[c])
        x = ps[b] + bl.matvec_const(Rs[b], np.asarray(model.con_pos[c]))
        points.append(x[:2])
    if not points:
        return jnp.zeros((0, 2, qposT.shape[-1]))
    return jnp.stack(points)


def contact_anchor_init(model, qpos):
    """Batch-first [B, ncon, 2] stick-friction anchors for ``qpos`` [B, nq]
    (what an env stores in its physics state at reset)."""
    return jnp.transpose(contact_points_T(model, qpos.T), (2, 0, 1))


def _contact_wrenches_T(model, Rs, ps, v_list, contact_timeconst, contact_dampratio,
                        dr: Optional[DomainParams] = None, terrain: Optional[Terrain] = None,
                        anchorsT=None):
    """Per-body world contact wrenches (list of [6, B], None where no
    contact touches the body) from penalty ground contacts, plus updated
    stick-friction anchors.  The generalized projection tau = J^T F happens
    in the caller's shared RNEA backward pass (``_backward_project_T``)
    instead of a per-contact masked-Jacobian product.

    Ground is the plane z=0, or a per-env heightfield when ``terrain`` is
    given (contact normal stays vertical — a penalty-model approximation
    that matches the reference's reward-side ground queries and is accurate
    for the mild slopes the terrain generator emits).

    Tangential friction is ANCHOR-BASED stick-slip: while a contact point
    stays inside the friction cone it is held by a spring to the position
    where it first touched (true static friction — no creep under load);
    when the spring force exceeds mu*fn the anchor slides to the cone
    boundary (kinetic friction).  A purely velocity-based Coulomb model
    cannot produce static force at zero slip velocity, which makes feet
    creep under stance load — fatal for velocity-tracking locomotion.
    """
    wrenches = [None] * model.nbody
    if len(model.con_body) == 0:
        return wrenches, anchorsT
    omega_c = 1.0 / contact_timeconst
    if dr is not None and dr.contact_stiffness_scale is not None:
        omega_c = omega_c * dr.contact_stiffness_scale
    dt = float(model.timestep)
    new_anchors = []
    for c in range(len(model.con_body)):
        b = int(model.con_body[c])
        m_eff = float(model.con_meff[c])
        # Gains are scheduled from the load-share mass (keeps standing
        # penetration ~mm) but CAPPED at the explicit-integration stability
        # bound of the contact's true apparent mass (con_m_app, the
        # 1/(J M^-1 J^T) mass of a light distal link can be ~100x smaller
        # than the load share — uncapped, the damper multiplies foot
        # velocity by dt*d/m_app >> 1 per substep and the leg explodes).
        m_app = float(model.con_m_app[c]) if len(model.con_m_app) else m_eff
        # symplectic-Euler spring bound is k < 4 m/dt^2 (omega dt < 2); cap
        # at 2 m/dt^2 so DR stiffness scaling cannot cross it.  The damper
        # is explicit (dv = -dt*d/m * v per substep) and needs dt*d/m < 1.
        stiffness = jnp.minimum(m_eff * omega_c**2, 2.0 * m_app / dt**2)
        damping = jnp.minimum(
            2.0 * contact_dampratio * m_eff * omega_c, 0.7 * m_app / dt
        )
        x = ps[b] + bl.matvec_const(Rs[b], np.asarray(model.con_pos[c]))  # [3, B]
        ground = terrain_height_T(terrain, x[0], x[1]) if terrain is not None else 0.0
        depth = float(model.con_radius[c]) - (x[2] - ground)
        in_contact = depth > 0.0
        omega, v_o = v_list[b][:3], v_list[b][3:]
        v_pt = v_o + bl.cross(omega, x)
        fn = jnp.where(in_contact, stiffness * depth - damping * v_pt[2], 0.0)
        fn = jnp.maximum(fn, 0.0)
        mu = float(model.con_friction[c])
        if dr is not None and dr.friction_scale is not None:
            mu = mu * dr.friction_scale
        f_max = mu * fn

        # tangential spring-damper to the anchor, clamped to the cone;
        # gains at the same stability bounds as the normal direction
        m_app_t = float(model.con_m_app_t[c]) if len(getattr(model, "con_m_app_t", [])) else m_app
        kt = 0.3 * m_app_t / dt**2
        ct = 0.4 * m_app_t / dt
        anchor = anchorsT[c]                                   # [2, B]
        anchor = jnp.where(in_contact[None], anchor, x[:2])    # track while free
        disp = x[:2] - anchor
        ft_raw = -(kt * disp + ct * v_pt[:2])                  # [2, B]
        ft_norm = jnp.sqrt(ft_raw[0] ** 2 + ft_raw[1] ** 2)
        cone = jnp.minimum(1.0, f_max / (ft_norm + 1e-9))
        ft = ft_raw * cone
        # sliding: project the anchor displacement onto the cone boundary
        disp_norm = jnp.sqrt(disp[0] ** 2 + disp[1] ** 2)
        max_disp = f_max / kt
        disp_clamped = disp * jnp.minimum(1.0, max_disp / (disp_norm + 1e-9))
        anchor = jnp.where(in_contact[None], x[:2] - disp_clamped, x[:2])
        new_anchors.append(anchor)

        f = jnp.stack([ft[0], ft[1], fn])                      # [3, B]
        F = jnp.concatenate([bl.cross(x, f), f])               # [6, B]
        wrenches[b] = F if wrenches[b] is None else wrenches[b] + F
    return wrenches, jnp.stack(new_anchors)


def forward_dynamics(model: PhysicsModel, qpos, qvel, ctrl,
                     contact_timeconst=0.015, contact_dampratio=1.0,
                     limit_stiffness=200.0, include_contacts=True,
                     dr=None, terrain=None):
    """Batched qacc [B, nv].  Public API is batch-first; internals batch-last."""
    qaccT, _ = _forward_dynamics_T(
        model, qpos.T, qvel.T, ctrl.T,
        contact_timeconst, contact_dampratio, limit_stiffness, include_contacts,
        dr, terrain,
    )
    return qaccT.T, None


def actuator_forces_T(model, qposT, qvelT, ctrlT, dr: Optional[DomainParams] = None):
    """Per-actuator joint forces [nu, B] (clip(kp de - kv qd) or motor torque).

    Recomputes what the reference reads from ``data.qfrc_actuator``
    (`robot_locomotion/mjx/reward_functions/default.py:141`) — cheap
    elementwise work, so the env's torque/power penalties don't need the
    engine to carry extra state."""
    if len(model.act_dof) == 0:
        return jnp.zeros((0, qposT.shape[-1]))
    forces = []
    for a in range(len(model.act_dof)):
        d = int(model.act_dof[a])
        body = int(model.act_joint_body[a])
        qa = int(model.qpos_adr[body])
        gear = float(model.act_gear[a])
        if bool(model.act_is_position[a]):
            kp = float(model.act_kp[a])
            kv = float(model.act_kv[a])
            if dr is not None and dr.kp_scale is not None:
                kp = kp * dr.kp_scale[a]
            if dr is not None and dr.kv_scale is not None:
                kv = kv * dr.kv_scale[a]
            target = ctrlT[a]
            if dr is not None and dr.ctrl_offset is not None:
                target = target + dr.ctrl_offset[a]
            force = kp * (target - qposT[qa]) - kv * qvelT[d]
        else:
            force = ctrlT[a] * gear
        lo, hi = model.act_forcerange[a]
        if dr is not None and dr.forcerange_scale is not None:
            lo, hi = float(lo) * dr.forcerange_scale[a], float(hi) * dr.forcerange_scale[a]
        else:
            lo, hi = float(lo), float(hi)
        force = jnp.clip(force, lo, hi)
        forces.append(force)
    return jnp.stack(forces)


def _forward_dynamics_T(model, qposT, qvelT, ctrlT,
                        contact_timeconst, contact_dampratio, limit_stiffness,
                        include_contacts, dr=None, terrain=None, anchorsT=None):
    M, f_net, Rs, ps, v_list, cols = _dynamics_T(model, qposT, qvelT, dr)
    lam, dof_body = _dof_structure(model)

    if include_contacts and len(model.con_body) > 0:
        if anchorsT is None:
            anchorsT = contact_points_T(model, qposT)
        wrenches, anchorsT = _contact_wrenches_T(
            model, Rs, ps, v_list, contact_timeconst, contact_dampratio,
            dr, terrain, anchorsT,
        )
        # fold contact wrenches into the bias backward pass: the chain
        # projection J^T F is exactly the ancestor accumulation RNEA does
        f_net = [
            fb if w is None else fb - w for fb, w in zip(f_net, wrenches)
        ]
    C = _backward_project_T(model, cols, f_net, dof_body)
    tau = jnp.zeros_like(C)

    # actuators
    act_force = actuator_forces_T(model, qposT, qvelT, ctrlT, dr)
    for a in range(len(model.act_dof)):
        d = int(model.act_dof[a])
        gear = float(model.act_gear[a])
        tau = tau.at[d].add(act_force[a] * (gear if bool(model.act_is_position[a]) else 1.0))

    # passive: damping, smooth dry friction, joint limits
    damping = np.asarray(model.dof_damping)[:, None]
    frictionloss = np.asarray(model.dof_frictionloss)[:, None]
    if dr is not None and dr.damping_scale is not None:
        damping = damping * dr.damping_scale
    if dr is not None and dr.frictionloss_scale is not None:
        frictionloss = frictionloss * dr.frictionloss_scale
    tau = tau - damping * qvelT
    tau = tau - frictionloss * jnp.tanh(qvelT / 0.05)
    dt = float(model.timestep)
    for i in range(model.nbody):
        if int(model.jnt_type[i]) == HINGE and bool(model.jnt_limited[i]):
            qa, d = int(model.qpos_adr[i]), int(model.dof_adr[i])
            lo, hi = model.jnt_range[i]
            over_hi = jnp.maximum(qposT[qa] - float(hi), 0.0)
            under_lo = jnp.maximum(float(lo) - qposT[qa], 0.0)
            # damp the limit spring while it is engaged (an undamped limit
            # conserves the impact energy and a fast joint bounces between
            # its limits forever); the damping coefficient is capped at the
            # armature's explicit-integration stability bound
            i_arm = float(model.dof_armature[d])
            d_lim = min(2.0 * np.sqrt(limit_stiffness * i_arm), 0.7 * i_arm / dt)
            engaged = (over_hi > 0.0) | (under_lo > 0.0)
            tau = tau.at[d].add(
                limit_stiffness * (under_lo - over_hi)
                - jnp.where(engaged, d_lim * qvelT[d], 0.0)
            )

    return bl.ltdl_solve(M, tau - C, lam), anchorsT


def _integrate_T(model, qposT, qvelT, qaccT, dt):
    """Semi-implicit Euler in batch-last layout."""
    qvel_new = qvelT + dt * qaccT
    qpos_new = qposT
    for i in range(model.nbody):
        jt = int(model.jnt_type[i])
        qa, d = int(model.qpos_adr[i]), int(model.dof_adr[i])
        if jt == FREE:
            qpos_new = qpos_new.at[qa: qa + 3].add(dt * qvel_new[d: d + 3])
            quat = bl.quat_integrate(qposT[qa + 3: qa + 7], qvel_new[d + 3: d + 6], dt)
            qpos_new = qpos_new.at[qa + 3: qa + 7].set(quat)
        elif jt == HINGE:
            qpos_new = qpos_new.at[qa].add(dt * qvel_new[d])
    return qpos_new, qvel_new


def step(model: PhysicsModel, qpos, qvel, ctrl, nr_substeps=1,
         contact_timeconst=0.015, contact_dampratio=1.0, limit_stiffness=200.0,
         dr=None, terrain=None, ctrl_sequence=None, contact_state=None):
    """Advance ``nr_substeps`` timesteps of ``model.timestep`` each.

    ``ctrl_sequence`` (optional, [nr_substeps, B, nu]) supplies a different
    control per substep — used for action-delay domain randomization
    (`robot_locomotion/mjx/environment.py:405-412` feeds per-substep delayed
    actions); otherwise ``ctrl`` [B, nu] is held for all substeps.

    ``contact_state`` (optional, [B, ncon, 2]): stick-friction anchors
    carried across control steps (see ``contact_anchor_init``).  When given,
    the return is ``(qpos, qvel, new_contact_state)`` and static friction
    holds across calls; when None, anchors are initialized from the entry
    pose (stick within this call only) and the return stays ``(qpos, qvel)``.

    When ``--runner.pallas_kernels`` is on, plane-ground steps route through
    the VMEM-resident Mosaic substep kernel
    (``rlx_tpu.ops.engine_substep_pallas``) — same math, one kernel per
    batch tile; heightfield terrain and non-tileable batches fall back to
    this XLA path.
    """
    from rlx_tpu.ops import _dispatch

    B = qpos.shape[0]
    if _dispatch.use_pallas() and terrain is None and B % min(256, B) == 0:
        from rlx_tpu.ops.engine_substep_pallas import step_pallas

        return step_pallas(
            model, qpos, qvel, ctrl, nr_substeps=nr_substeps,
            contact_timeconst=contact_timeconst,
            contact_dampratio=contact_dampratio,
            limit_stiffness=limit_stiffness, dr=dr, terrain=None,
            ctrl_sequence=ctrl_sequence, contact_state=contact_state,
            interpret=_dispatch.interpret(),
        )
    dt = model.timestep

    def substep(carry, ctrlT):
        qposT, qvelT, anchorsT = carry
        qaccT, anchorsT = _forward_dynamics_T(
            model, qposT, qvelT, ctrlT,
            contact_timeconst, contact_dampratio, limit_stiffness, True,
            dr, terrain, anchorsT,
        )
        qposT, qvelT = _integrate_T(model, qposT, qvelT, qaccT, dt)
        return (qposT, qvelT, anchorsT), None

    if ctrl_sequence is not None:
        xs = jnp.swapaxes(ctrl_sequence, 1, 2)  # [nr_substeps, nu, B]
    else:
        xs = jnp.broadcast_to(ctrl.T[None], (nr_substeps,) + ctrl.T.shape)
    if contact_state is not None:
        anchorsT = jnp.transpose(contact_state, (1, 2, 0))  # [ncon, 2, B]
    else:
        anchorsT = contact_points_T(model, qpos.T)
    (qposT, qvelT, anchorsT), _ = jax.lax.scan(
        substep, (qpos.T, qvel.T, anchorsT), xs
    )
    if contact_state is not None:
        return qposT.T, qvelT.T, jnp.transpose(anchorsT, (2, 0, 1))
    return qposT.T, qvelT.T


def kinematics(model: PhysicsModel, qpos):
    """Batched FK -> (R [B, nbody, 3, 3], p [B, nbody, 3]) (diagnostics API)."""
    Rs, ps = _kinematics_T(model, qpos.T)
    R = jnp.stack([jnp.transpose(r, (2, 0, 1)) for r in Rs], axis=1)
    p = jnp.stack([r.T for r in ps], axis=1)
    return R, p
