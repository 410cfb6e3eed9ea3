"""Pallas substep kernel (interpret mode) must match ``engine.step`` exactly.

Mosaic compilation hangs over the hosted axon tunnel (CLAUDE.md), so these
tests run the kernel through the Pallas interpreter on CPU — same kernel
body, same block decomposition, executable anywhere; the compiled path is
for direct-attached TPUs."""

import numpy as np
import pytest

from rlx_tpu.ops.engine_substep_pallas import step_pallas
from rlx_tpu.physics import engine, load_mjcf

from tests.test_physics import ANT_XML, TEST_XML, random_state


def _batch_state(model, xml_path, xml_string, B, seed, free_height):
    import mujoco

    m = (
        mujoco.MjModel.from_xml_path(xml_path)
        if xml_path
        else mujoco.MjModel.from_xml_string(xml_string)
    )
    rng = np.random.default_rng(seed)
    qpos = np.stack([random_state(m, rng, free_height)[0] for _ in range(B)])
    qvel = np.stack([random_state(m, rng, free_height)[1] for _ in range(B)])
    ctrl = rng.uniform(-0.5, 0.5, size=(B, max(len(model.act_dof), 1))).astype(
        np.float32
    )[:, : len(model.act_dof)]
    return qpos.astype(np.float32), qvel.astype(np.float32), ctrl


@pytest.mark.parametrize(
    "xml_path,xml_string,free_height,blocks",
    [
        (None, TEST_XML, 2.0, 1),   # contact-free hinge tree, one tile
        (ANT_XML, None, 0.75, 2),   # ant with ground contacts, two tiles
    ],
)
def test_substep_kernel_matches_engine(xml_path, xml_string, free_height, blocks):
    model = (
        load_mjcf(xml_path=xml_path, keyframe="home")
        if xml_path
        else load_mjcf(xml_string=xml_string)
    )
    block_b = 16
    B = block_b * blocks
    qpos, qvel, ctrl = _batch_state(model, xml_path, xml_string, B, 0, free_height)

    anchors = engine.contact_anchor_init(model, qpos) if len(model.con_body) else None
    args = dict(nr_substeps=4)
    if anchors is not None:
        ref = engine.step(model, qpos, qvel, ctrl, contact_state=anchors, **args)
        out = step_pallas(
            model, qpos, qvel, ctrl, contact_state=anchors,
            block_b=block_b, interpret=True, **args,
        )
    else:
        ref = engine.step(model, qpos, qvel, ctrl, **args)
        out = step_pallas(model, qpos, qvel, ctrl, block_b=block_b, interpret=True, **args)

    assert len(ref) == len(out)
    for r, o, name in zip(ref, out, ("qpos", "qvel", "anchors")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=1e-5, atol=1e-5,
            err_msg=f"{name} diverged from engine.step",
        )


def test_substep_kernel_ctrl_sequence():
    """Per-substep control (action-delay DR path) matches the engine."""
    model = load_mjcf(xml_string=TEST_XML)
    B, S = 16, 3
    qpos, qvel, _ = _batch_state(model, None, TEST_XML, B, 1, 2.0)
    rng = np.random.default_rng(2)
    seq = rng.uniform(-0.5, 0.5, size=(S, B, len(model.act_dof))).astype(np.float32)
    ref = engine.step(model, qpos, qvel, seq[0], nr_substeps=S, ctrl_sequence=seq)
    out = step_pallas(
        model, qpos, qvel, seq[0], nr_substeps=S, ctrl_sequence=seq,
        block_b=16, interpret=True,
    )
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_substep_kernel_domain_params_match_engine():
    """Per-env DomainParams ride into the kernel as lane-blocked inputs —
    randomized physics (the flagship training path) matches the engine."""
    model = load_mjcf(xml_path=ANT_XML, keyframe="home")
    B = 16
    qpos, qvel, ctrl = _batch_state(model, ANT_XML, None, B, 4, 0.75)
    rng = np.random.default_rng(5)
    import jax.numpy as jnp

    dr = engine.DomainParams(
        mass_scale=jnp.asarray(
            rng.uniform(0.8, 1.2, size=(len(model.body_mass), B)), jnp.float32
        ),
        damping_scale=jnp.asarray(rng.uniform(0.5, 1.5, size=(B,)), jnp.float32),
        kp_scale=jnp.asarray(
            rng.uniform(0.9, 1.1, size=(len(model.act_dof), B)), jnp.float32
        ),
        gravity=jnp.asarray(
            np.broadcast_to([0.0, 0.0, -9.81], (B, 3)).T
            * rng.uniform(0.9, 1.1, size=(B,)),
            jnp.float32,
        ),
    )
    anchors = engine.contact_anchor_init(model, qpos)
    ref = engine.step(model, qpos, qvel, ctrl, nr_substeps=2, dr=dr,
                      contact_state=anchors)
    out = step_pallas(model, qpos, qvel, ctrl, nr_substeps=2, dr=dr,
                      contact_state=anchors, block_b=16, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_substep_kernel_rejects_unsupported_paths():
    model = load_mjcf(xml_string=TEST_XML)
    qpos, qvel, ctrl = _batch_state(model, None, TEST_XML, 16, 3, 2.0)
    with pytest.raises(NotImplementedError):
        step_pallas(
            model, qpos, qvel, ctrl,
            terrain=engine.Terrain(
                height=np.zeros((4 * 4, 16), np.float32), n=4, half_extent_m=1.0
            ),
            interpret=True,
        )
    with pytest.raises(ValueError):
        step_pallas(model, qpos, qvel, ctrl, block_b=5, interpret=True)
