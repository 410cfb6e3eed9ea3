"""Batched spatial-algebra primitives (Featherstone conventions).

Motion vectors are ``[omega; v]`` (angular first), referenced at the world
origin in world coordinates unless stated otherwise.  All ops broadcast over
leading batch dimensions; 3x3/6x6 matrices are materialized explicitly —
with <=15 DOF trees the dense forms are faster to fuse than clever
factorizations, and far easier to verify.
"""

import jax.numpy as jnp


def skew(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_to_rot(q):
    """Unit quaternion [..., 4] (w, x, y, z — MuJoCo order) -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(a, b):
    """Hamilton product, (w, x, y, z) order."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_integrate(q, omega_local, dt):
    """q <- q ∘ exp(0.5 * omega_local * dt); omega in the body frame
    (MuJoCo free-joint convention)."""
    angle = jnp.linalg.norm(omega_local, axis=-1, keepdims=True) * dt
    half = 0.5 * angle
    # safe normalize
    axis = omega_local / jnp.maximum(jnp.linalg.norm(omega_local, axis=-1, keepdims=True), 1e-9)
    dq = jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def crm(v):
    """Spatial motion cross product matrix [..., 6, 6]: crm(v) @ m = v x m."""
    w = skew(v[..., :3])
    lin = skew(v[..., 3:])
    zero = jnp.zeros_like(w)
    top = jnp.concatenate([w, zero], axis=-1)
    bottom = jnp.concatenate([lin, w], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def crf(v):
    """Spatial force cross product: crf(v) = -crm(v)^T."""
    return -jnp.swapaxes(crm(v), -1, -2)


def spatial_inertia_world(mass, inertia_com_world, com_world):
    """Spatial inertia referenced at the WORLD ORIGIN, world coordinates.

    ``inertia_com_world``: [..., 3, 3] rotational inertia about the com in
    world axes; ``com_world``: [..., 3].  Featherstone RBDA (2.63):
      I = [[I_c + m c^ c^T, m c^], [m c^T, m 1]]
    """
    c = skew(com_world)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), c.shape)
    top_left = inertia_com_world + m * (c @ jnp.swapaxes(c, -1, -2))
    top_right = m * c
    bottom_left = m * jnp.swapaxes(c, -1, -2)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def point_force_to_spatial(point_world, force_world, torque_world=None):
    """Force at a world point -> world-origin spatial force [n x f + tau; f]."""
    moment = jnp.cross(point_world, force_world)
    if torque_world is not None:
        moment = moment + torque_world
    return jnp.concatenate([moment, force_world], axis=-1)
