"""Batched forward dynamics + integrator (pure JAX).

Formulation: world-frame, world-origin-referenced spatial algebra.
Per substep:

1. forward kinematics (python loop over the static tree, parents first);
2. world Jacobian columns per dof: hinge ``[a; x_anchor x a]``, free joint
   ``[0; e_k]`` + ``[a_k; p x a_k]`` with MuJoCo's free-joint convention
   (linear velocity world, angular velocity body-local);
3. mass matrix  M = sum_i J_i^T I_i^W J_i  (+ armature on the diagonal);
4. bias forces via the velocity-product recursion
   zeta_i = zeta_parent + v_i x (S_i qd_i),  f_i = I zeta + v x* I v,
   with gravity folded in as base acceleration  zeta_root = [0; -g];
5. penalty contacts (sphere/capsule-endpoint vs plane z=0): spring-damper
   normal + smooth Coulomb friction;
6. actuators: position servo  clip(kp (ctrl - q) - kv qd)  or torque motor;
   passive -damping qd - frictionloss tanh(qd/0.05); joint-limit springs;
7. qacc = solve(M, tau - C + J^T f_ext); semi-implicit Euler; quaternion
   integration for the free joint.

Everything is ``[B, ...]``-batched; loops are over the static tree (<=15
bodies) and unrolled by XLA into one fused program of [B,6,6]/[B,nv,nv]
einsums and a batched Cholesky solve — dense, static, MXU-friendly.

Validated against MuJoCo C: mass matrix (mj_fullM), bias (qfrc_bias), and
smooth-dynamics qacc in tests/test_physics.py.  The contact model is an
intentional departure from MuJoCo's solver (soft penalty, brax-style) —
solver-based contact does not map well onto fused TPU batch programs.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.physics.model import FREE, HINGE, PhysicsModel
from rlx_tpu.physics import spatial as sp


def _ancestor_masks(model: PhysicsModel) -> np.ndarray:
    """Static [nbody, nv] mask: dof j moves body i."""
    mask = np.zeros((model.nbody, model.nv), dtype=np.float32)
    for i in range(model.nbody):
        b = i
        while b != -1:
            if model.jnt_type[b] == FREE:
                mask[i, model.dof_adr[b]: model.dof_adr[b] + 6] = 1.0
            elif model.jnt_type[b] == HINGE:
                mask[i, model.dof_adr[b]] = 1.0
            b = int(model.parent[b])
    return mask


def kinematics(model: PhysicsModel, qpos):
    """Batched FK -> (R [B, nbody, 3, 3], p [B, nbody, 3])."""
    B = qpos.shape[0]
    Rs, ps = [], []
    for i in range(model.nbody):
        par = int(model.parent[i])
        if par == -1:
            Rp = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
            pp = jnp.zeros((B, 3))
        else:
            Rp, pp = Rs[par], ps[par]
        R_off = sp.quat_to_rot(jnp.asarray(model.body_quat[i]))
        R_frame = Rp @ R_off
        p_frame = pp + jnp.einsum("bij,j->bi", Rp, jnp.asarray(model.body_pos[i]))
        jt = int(model.jnt_type[i])
        if jt == FREE:
            qa = int(model.qpos_adr[i])
            p = qpos[:, qa: qa + 3]
            R = sp.quat_to_rot(qpos[:, qa + 3: qa + 7])
        elif jt == HINGE:
            qa = int(model.qpos_adr[i])
            angle = qpos[:, qa]
            axis = jnp.asarray(model.jnt_axis[i])
            # Rodrigues rotation about the local joint axis
            K = sp.skew(axis)
            s, c = jnp.sin(angle), jnp.cos(angle)
            R_axis = (
                jnp.eye(3)[None]
                + s[:, None, None] * K[None]
                + (1.0 - c)[:, None, None] * (K @ K)[None]
            )
            R = R_frame @ R_axis
            anchor = jnp.asarray(model.jnt_pos[i])
            p = p_frame + jnp.einsum("bij,j->bi", R_frame - R, anchor)
        else:
            R, p = R_frame, p_frame
        Rs.append(R)
        ps.append(p)
    return jnp.stack(Rs, axis=1), jnp.stack(ps, axis=1)


def _jacobian_columns(model: PhysicsModel, R, p):
    """[B, nv, 6] world-origin Plücker columns for every dof."""
    B = R.shape[0]
    cols = [None] * model.nv
    for i in range(model.nbody):
        jt = int(model.jnt_type[i])
        if jt == FREE:
            d = int(model.dof_adr[i])
            for k in range(3):  # linear dofs, world axes
                e = jnp.zeros((B, 3)).at[:, k].set(1.0)
                cols[d + k] = jnp.concatenate([jnp.zeros((B, 3)), e], axis=-1)
            for k in range(3):  # angular dofs, body-local axes (MuJoCo convention)
                a = R[:, i, :, k]
                cols[d + 3 + k] = jnp.concatenate([a, jnp.cross(p[:, i], a)], axis=-1)
        elif jt == HINGE:
            d = int(model.dof_adr[i])
            a = jnp.einsum("bij,j->bi", R[:, i], jnp.asarray(model.jnt_axis[i]))
            anchor = p[:, i] + jnp.einsum("bij,j->bi", R[:, i], jnp.asarray(model.jnt_pos[i]))
            cols[d] = jnp.concatenate([a, jnp.cross(anchor, a)], axis=-1)
    return jnp.stack(cols, axis=1)


def _body_inertias_world(model: PhysicsModel, R, p):
    """[B, nbody, 6, 6] spatial inertias at world-origin reference."""
    R_icom = R @ sp.quat_to_rot(jnp.asarray(model.body_iquat))[None]
    I_diag = jnp.asarray(model.body_inertia)  # [nbody, 3]
    I_c = jnp.einsum("bnij,nj,bnkj->bnik", R_icom, I_diag, R_icom)
    com = p + jnp.einsum("bnij,nj->bni", R, jnp.asarray(model.body_ipos))
    return sp.spatial_inertia_world(jnp.asarray(model.body_mass)[None, :], I_c, com)


def _contact_forces(model: PhysicsModel, R, p, v_bodies, contact_timeconst, contact_dampratio):
    """Penalty plane contacts -> per-body world-origin spatial forces [B, nbody, 6].

    Gains are critically damped per contact from the effective mass
    (MuJoCo solref-style): omega = 1/timeconst, k = m_eff omega^2,
    c = 2 zeta m_eff omega — keeps dt * omega << 1 regardless of link
    masses, which a fixed global stiffness cannot.
    """
    B = R.shape[0]
    F = jnp.zeros((B, model.nbody, 6))
    if len(model.con_body) == 0:
        return F
    omega_c = 1.0 / contact_timeconst
    for c in range(len(model.con_body)):
        b = int(model.con_body[c])
        m_eff = float(model.con_meff[c])
        stiffness = m_eff * omega_c**2
        damping = 2.0 * contact_dampratio * m_eff * omega_c
        x = p[:, b] + jnp.einsum("bij,j->bi", R[:, b], jnp.asarray(model.con_pos[c]))
        depth = jnp.asarray(model.con_radius[c]) - x[:, 2]
        in_contact = depth > 0.0
        # point velocity from the body's origin-referenced spatial velocity
        omega, v_o = v_bodies[:, b, :3], v_bodies[:, b, 3:]
        v_pt = v_o + jnp.cross(omega, x)
        fn = jnp.where(
            in_contact,
            stiffness * depth - damping * v_pt[:, 2],
            0.0,
        )
        fn = jnp.maximum(fn, 0.0)
        vt = v_pt[:, :2]
        vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
        mu = jnp.asarray(model.con_friction[c])
        ft = -mu * fn[:, None] * vt / (vt_norm + 1e-3)
        f = jnp.concatenate([ft, fn[:, None]], axis=-1)
        F = F.at[:, b].add(sp.point_force_to_spatial(x, f))
    return F


def forward_dynamics(model: PhysicsModel, qpos, qvel, ctrl,
                     contact_timeconst=0.015, contact_dampratio=1.0,
                     limit_stiffness=200.0, include_contacts=True):
    """Batched qacc [B, nv] (+ body kinematics as aux)."""
    masks = jnp.asarray(_ancestor_masks(model))  # [nbody, nv]
    R, p = kinematics(model, qpos)
    cols = _jacobian_columns(model, R, p)        # [B, nv, 6]
    I_w = _body_inertias_world(model, R, p)      # [B, nbody, 6, 6]

    # Mass matrix
    Jb = cols[:, None] * masks[None, :, :, None]           # [B, nbody, nv, 6]
    M = jnp.einsum("bnvi,bnij,bnwj->bvw", Jb, I_w, Jb)
    M = M + jnp.diag(jnp.asarray(model.dof_armature))[None]

    # Body spatial velocities + bias accelerations (gravity as base accel)
    g = jnp.asarray(model.gravity)
    zeta0 = jnp.concatenate([jnp.zeros((qpos.shape[0], 3)), -jnp.broadcast_to(g, (qpos.shape[0], 3))], axis=-1)
    v_list, zeta_list = [], []
    for i in range(model.nbody):
        par = int(model.parent[i])
        v_par = v_list[par] if par != -1 else jnp.zeros_like(zeta0)
        z_par = zeta_list[par] if par != -1 else zeta0
        jt = int(model.jnt_type[i])
        if jt == FREE:
            d = int(model.dof_adr[i])
            own = jnp.einsum("bdk,bd->bk", cols[:, d: d + 6], qvel[:, d: d + 6])
            # Only the child-fixed angular columns have nonzero derivative
            # (the linear columns [0; e_k] are world-constant), so the
            # velocity-product term uses the angular contribution alone.
            own_moving = jnp.einsum(
                "bdk,bd->bk", cols[:, d + 3: d + 6], qvel[:, d + 3: d + 6]
            )
        elif jt == HINGE:
            d = int(model.dof_adr[i])
            own = cols[:, d] * qvel[:, d][:, None]
            own_moving = own
        else:
            own = jnp.zeros_like(zeta0)
            own_moving = own
        v_i = v_par + own
        zeta_i = z_par + jnp.einsum("bij,bj->bi", sp.crm(v_i), own_moving)
        v_list.append(v_i)
        zeta_list.append(zeta_i)
    v_bodies = jnp.stack(v_list, axis=1)     # [B, nbody, 6]
    zetas = jnp.stack(zeta_list, axis=1)

    f_bias = (
        jnp.einsum("bnij,bnj->bni", I_w, zetas)
        + jnp.einsum("bnij,bnj->bni", sp.crf(v_bodies), jnp.einsum("bnij,bnj->bni", I_w, v_bodies))
    )
    C = jnp.einsum("bnvi,bni->bv", Jb, f_bias)

    # Generalized external contact forces
    tau_ext = jnp.zeros_like(C)
    if include_contacts and len(model.con_body) > 0:
        F_contact = _contact_forces(model, R, p, v_bodies, contact_timeconst, contact_dampratio)
        tau_ext = jnp.einsum("bnvi,bni->bv", Jb, F_contact)

    # Actuation
    tau_act = jnp.zeros_like(C)
    for a in range(len(model.act_dof)):
        d = int(model.act_dof[a])
        body = int(model.act_joint_body[a])
        qa = int(model.qpos_adr[body])
        gear = jnp.asarray(model.act_gear[a])
        if bool(model.act_is_position[a]):
            force = model.act_kp[a] * (ctrl[:, a] - qpos[:, qa]) - model.act_kv[a] * qvel[:, d]
        else:
            force = ctrl[:, a] * gear
        lo, hi = model.act_forcerange[a]
        force = jnp.clip(force, lo, hi)
        tau_act = tau_act.at[:, d].add(force * (gear if bool(model.act_is_position[a]) else 1.0))

    # Passive: damping, smooth dry friction, joint limits
    tau_passive = (
        -jnp.asarray(model.dof_damping)[None] * qvel
        - jnp.asarray(model.dof_frictionloss)[None] * jnp.tanh(qvel / 0.05)
    )
    for i in range(model.nbody):
        if int(model.jnt_type[i]) == HINGE and bool(model.jnt_limited[i]):
            qa, d = int(model.qpos_adr[i]), int(model.dof_adr[i])
            lo, hi = model.jnt_range[i]
            over_hi = jnp.maximum(qpos[:, qa] - hi, 0.0)
            under_lo = jnp.maximum(lo - qpos[:, qa], 0.0)
            tau_passive = tau_passive.at[:, d].add(limit_stiffness * (under_lo - over_hi))

    tau = tau_act + tau_passive + tau_ext

    # qacc = M^{-1} (tau - C), batched Cholesky
    chol = jax.scipy.linalg.cho_factor(M)
    qacc = jax.scipy.linalg.cho_solve(chol, (tau - C)[..., None])[..., 0]
    return qacc, (R, p, v_bodies)


def _integrate(model: PhysicsModel, qpos, qvel, qacc, dt):
    """Semi-implicit Euler with quaternion integration for the free joint."""
    qvel_new = qvel + dt * qacc
    qpos_new = qpos
    for i in range(model.nbody):
        jt = int(model.jnt_type[i])
        qa, d = int(model.qpos_adr[i]), int(model.dof_adr[i])
        if jt == FREE:
            qpos_new = qpos_new.at[:, qa: qa + 3].add(dt * qvel_new[:, d: d + 3])
            quat = sp.quat_integrate(qpos[:, qa + 3: qa + 7], qvel_new[:, d + 3: d + 6], dt)
            qpos_new = qpos_new.at[:, qa + 3: qa + 7].set(quat)
        elif jt == HINGE:
            qpos_new = qpos_new.at[:, qa].add(dt * qvel_new[:, d])
    return qpos_new, qvel_new


def step(model: PhysicsModel, qpos, qvel, ctrl, nr_substeps=1,
         contact_timeconst=0.015, contact_dampratio=1.0, limit_stiffness=200.0):
    """Advance ``nr_substeps`` timesteps of ``model.timestep`` each."""
    dt = model.timestep

    def substep(carry, _):
        qpos, qvel = carry
        qacc, _ = forward_dynamics(
            model, qpos, qvel, ctrl,
            contact_timeconst=contact_timeconst,
            contact_dampratio=contact_dampratio,
            limit_stiffness=limit_stiffness,
        )
        return _integrate(model, qpos, qvel, qacc, dt), None

    (qpos, qvel), _ = jax.lax.scan(substep, (qpos, qvel), None, nr_substeps)
    return qpos, qvel
