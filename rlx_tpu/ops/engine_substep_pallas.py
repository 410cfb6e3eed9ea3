"""Pallas/Mosaic physics-substep kernel: the whole substep in VMEM.

Motivation (benchmarks/ROOFLINE.md round 5): after the tree-sparse rewrite
the engine substep is FK/Jacobian-dominated and *fusion-bound* — ~1k
[B]-wide multiply-adds spread over partially-fused XLA ops whose
intermediates round-trip HBM.  One kernel instance per batch tile keeps
qpos/qvel/ctrl and every intermediate (rotations, Jacobian columns,
composite inertias, the LTDL factors) resident in VMEM across ALL
``nr_substeps`` substeps, eliminating the inter-op HBM traffic entirely.

Design
------
- Grid: 1-D over batch tiles of ``block_b`` lanes; the batch dimension is
  minor (lanes) everywhere, matching the engine's batch-last ``[comp..., B]``
  layout (rlx_tpu/physics/batched.py) — each structural component is a
  full-width VPU row.
- Body: the kernel REUSES the engine's own batch-last substep functions
  (``engine._forward_dynamics_T`` + ``engine._integrate_T``) on values
  loaded from VMEM refs.  Those bodies are static-shaped, scatter/gather
  free (static slices and static ``.at[]`` updates only), and unrolled over
  the structural dims — exactly the op set Mosaic lowers.  There is ONE
  engine implementation; this file only changes where it executes.
- The model's compile-time constants (inertia frames, armature, axes)
  appear as non-scalar jaxpr constants, which ``pallas_call`` forbids in a
  kernel closure — ``jax.closure_convert`` lifts them into explicit kernel
  inputs, mapped with batch-independent (replicated) block specs.
- The substep loop is a static Python unroll inside the kernel (typically
  4), so state never leaves VMEM between substeps.

Restrictions (documented, asserted):
- ``terrain`` is unsupported (nearest-cell heightfield lookup is a dynamic
  gather; plane ``z=0`` only).  ``dr`` (DomainParams) is unsupported in the
  kernel path — the randomized-physics training envs keep the XLA path.
- ``block_b`` must divide the batch; f32 only.

Execution status: equivalence-validated in interpreter mode
(tests/test_engine_substep_pallas.py) against ``engine.step`` on the ant
model and a hinge-chain model.  Mosaic compilation HANGS over the hosted
axon TPU tunnel (CLAUDE.md), so the compiled path is gated behind
``interpret=False`` for direct-attached TPUs.

Reference counterpart: the Warp kernels the reference uses for its custom
simulators (`rl_x/environments/custom_isaac_lab/.../warp` pattern) — here
re-imagined as a TPU Mosaic kernel over the engine's own math.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rlx_tpu.physics import engine as _engine


def _make_substep_body(model, nr_substeps, contact_timeconst, contact_dampratio,
                       limit_stiffness, has_contacts, dr_names):
    dt = float(model.timestep)

    def body(qposT, qvelT, ctrl_seq, anchorsT, *dr_vals):
        dr = None
        if dr_names:
            # rebuild DomainParams from the kernel inputs; [B] fields were
            # lifted to [1, B] for tiling and squeeze back here
            dr = _engine.DomainParams(**{
                name: (val[0] if squeeze else val)
                for (name, squeeze), val in zip(dr_names, dr_vals)
            })
        for s in range(nr_substeps):
            qaccT, new_anchors = _engine._forward_dynamics_T(
                model, qposT, qvelT, ctrl_seq[s],
                contact_timeconst, contact_dampratio, limit_stiffness,
                has_contacts, dr, None,
                anchorsT if has_contacts else None,
            )
            if has_contacts:
                anchorsT = new_anchors
            qposT, qvelT = _engine._integrate_T(model, qposT, qvelT, qaccT, dt)
        return qposT, qvelT, anchorsT

    return body


def step_pallas(model, qpos, qvel, ctrl, nr_substeps=1,
                contact_timeconst=0.015, contact_dampratio=1.0,
                limit_stiffness=200.0, dr=None, terrain=None,
                ctrl_sequence=None, contact_state=None,
                block_b=256, interpret=False):
    """Drop-in for ``engine.step`` (same signature + ``block_b``/``interpret``).

    Public API batch-first (qpos [B, nq], qvel [B, nv], ctrl [B, nu]);
    returns (qpos, qvel) or (qpos, qvel, contact_state) exactly like
    ``engine.step``.
    """
    if terrain is not None:
        raise NotImplementedError(
            "step_pallas covers the plane-ground path (the heightfield "
            "lookup is a dynamic gather); Terrain stays on the XLA engine path"
        )
    B, nq = qpos.shape
    nv = qvel.shape[1]
    nu = len(model.act_dof)
    block_b = min(block_b, B)
    if B % block_b != 0:
        raise ValueError(f"block_b={block_b} must divide the batch B={B}")
    ncon = len(model.con_body)
    has_contacts = ncon > 0

    qposT = qpos.T.astype(jnp.float32)
    qvelT = qvel.T.astype(jnp.float32)
    if ctrl_sequence is not None:
        ctrl_seq = jnp.swapaxes(ctrl_sequence, 1, 2).astype(jnp.float32)
    else:
        ctrl_seq = jnp.broadcast_to(
            ctrl.T[None].astype(jnp.float32), (nr_substeps, max(nu, 1), B)
        )
    if has_contacts:
        if contact_state is not None:
            anchorsT = jnp.transpose(contact_state, (1, 2, 0)).astype(jnp.float32)
        else:
            anchorsT = _engine.contact_points_T(model, qposT)
    else:
        anchorsT = jnp.zeros((1, 2, B), jnp.float32)

    # Per-env DomainParams ride along as lane-blocked inputs: every field is
    # [..., B] batch-last; [B] fields are lifted to [1, B] for tiling.
    dr_names, dr_arrays = [], []
    if dr is not None:
        for name in dr._fields:
            val = getattr(dr, name)
            if val is None:
                continue
            squeeze = val.ndim == 1
            dr_names.append((name, squeeze))
            dr_arrays.append(
                (val[None] if squeeze else val).astype(jnp.float32)
            )

    body = _make_substep_body(
        model, int(nr_substeps), contact_timeconst, contact_dampratio,
        limit_stiffness, has_contacts, dr_names,
    )
    # Lift the model's non-scalar trace-time constants (pallas_call forbids
    # captured array constants) into explicit kernel inputs: trace the body
    # once per tile shape, then evaluate the jaxpr inside the kernel with
    # the constants fed from replicated VMEM refs.
    tile_example = [
        jax.ShapeDtypeStruct((nq, block_b), jnp.float32),
        jax.ShapeDtypeStruct((nv, block_b), jnp.float32),
        jax.ShapeDtypeStruct((nr_substeps, max(nu, 1), block_b), jnp.float32),
        jax.ShapeDtypeStruct((max(ncon, 1), 2, block_b), jnp.float32),
    ] + [
        jax.ShapeDtypeStruct(a.shape[:-1] + (block_b,), jnp.float32)
        for a in dr_arrays
    ]
    closed_jaxpr = jax.make_jaxpr(body)(*tile_example)
    consts = [jnp.asarray(c) for c in closed_jaxpr.consts]

    n_args = 4 + len(dr_arrays)

    def kernel(*refs):
        arg_refs = refs[:n_args]
        const_refs = refs[n_args: n_args + len(consts)]
        out_refs = refs[n_args + len(consts):]
        outs = jax.core.eval_jaxpr(
            closed_jaxpr.jaxpr,
            [r[:] for r in const_refs],
            *(r[:] for r in arg_refs),
        )
        for out_ref, val in zip(out_refs, outs):
            out_ref[:] = val

    grid = (B // block_b,)
    lane_block = lambda *lead: pl.BlockSpec(
        lead + (block_b,), lambda i, _n=len(lead): (0,) * _n + (i,)
    )
    const_block = lambda c: pl.BlockSpec(
        c.shape, lambda i, _n=c.ndim: (0,) * _n
    )
    qposT, qvelT, anchorsT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_block(nq),
            lane_block(nv),
            lane_block(nr_substeps, max(nu, 1)),
            lane_block(max(ncon, 1), 2),
            *[lane_block(*a.shape[:-1]) for a in dr_arrays],
            *[const_block(c) for c in consts],
        ],
        out_specs=[
            lane_block(nq),
            lane_block(nv),
            lane_block(max(ncon, 1), 2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, B), jnp.float32),
            jax.ShapeDtypeStruct((nv, B), jnp.float32),
            jax.ShapeDtypeStruct((max(ncon, 1), 2, B), jnp.float32),
        ],
        interpret=interpret,
    )(qposT, qvelT, ctrl_seq, anchorsT, *dr_arrays, *consts)

    if contact_state is not None:
        return qposT.T, qvelT.T, jnp.transpose(anchorsT, (2, 0, 1))
    return qposT.T, qvelT.T
