"""Golden tests of the pure-JAX engine against MuJoCo C (host).

Smooth (contact-free) dynamics must match MuJoCo closely: mass matrix,
bias forces, and forward-dynamics qacc.  Contact behavior is validated for
stability only (the penalty model intentionally differs from MuJoCo's
solver)."""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from rlx_tpu.physics import engine, load_mjcf

TEST_XML = """
<mujoco model="smoketree">
  <option timestep="0.005"/>
  <default>
    <joint armature="0.05" damping="0.2" frictionloss="0"/>
    <geom contype="0" conaffinity="0" density="300"/>
  </default>
  <worldbody>
    <body name="base" pos="0 0 2">
      <joint name="root" type="free" armature="0" damping="0"/>
      <geom name="core" type="sphere" size="0.15"/>
      <body name="arm1" pos="0.2 0.1 0">
        <joint name="j1" type="hinge" axis="0 1 0" pos="0.05 0 0"/>
        <geom name="g1" type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
        <body name="arm2" pos="0.3 0 0" quat="0.9238795 0 0 0.3826834">
          <joint name="j2" type="hinge" axis="1 0 1"/>
          <geom name="g2" type="capsule" size="0.03" fromto="0 0 0 0 0.25 0"/>
        </body>
      </body>
      <body name="arm3" pos="-0.1 0 0.1">
        <joint name="j3" type="hinge" axis="1 0 0"/>
        <geom name="g3" type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j1" gear="1.5"/>
    <motor joint="j2" gear="1"/>
    <motor joint="j3" gear="2"/>
  </actuator>
</mujoco>
"""

ANT_XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rlx_tpu", "environments", "locomotion", "ant", "data", "ant.xml",
)


def random_state(m, rng, free_height=2.0):
    qpos = np.array(m.qpos0)
    qvel = rng.normal(size=m.nv) * 0.5
    for j in range(m.njnt):
        if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
            adr = m.jnt_qposadr[j]
            qpos[adr:adr + 3] = rng.normal(size=3) * 0.1 + [0, 0, free_height]
            quat = rng.normal(size=4)
            qpos[adr + 3:adr + 7] = quat / np.linalg.norm(quat)
        elif m.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE:
            adr = m.jnt_qposadr[j]
            lo, hi = m.jnt_range[j]
            if m.jnt_limited[j]:
                margin = 0.1 * (hi - lo)
                qpos[adr] = rng.uniform(lo + margin, hi - margin)
            else:
                qpos[adr] = rng.uniform(-1.0, 1.0)
    return qpos, qvel


@pytest.mark.parametrize("xml,from_path", [(TEST_XML, False), (ANT_XML, True)])
def test_mass_matrix_and_bias_match_mujoco(xml, from_path):
    m = mujoco.MjModel.from_xml_path(xml) if from_path else mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    model = load_mjcf(xml_path=xml) if from_path else load_mjcf(xml_string=xml)

    rng = np.random.default_rng(7)
    for trial in range(3):
        qpos, qvel = random_state(m, rng, free_height=3.0)  # far above the plane
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(m, d)
        M_mj = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, M_mj)

        M, C = engine.mass_matrix_bias(
            model, jnp.asarray(qpos, jnp.float32)[None], jnp.asarray(qvel, jnp.float32)[None]
        )
        np.testing.assert_allclose(np.asarray(M[0]), M_mj, rtol=2e-3, atol=2e-3)
        scale = np.maximum(np.abs(np.asarray(d.qfrc_bias)), 1.0)
        np.testing.assert_allclose(
            np.asarray(C[0]) / scale, np.asarray(d.qfrc_bias) / scale, atol=2e-3
        )


@pytest.mark.parametrize("xml,from_path", [(TEST_XML, False), (ANT_XML, True)])
def test_smooth_qacc_matches_mujoco(xml, from_path):
    m = mujoco.MjModel.from_xml_path(xml) if from_path else mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    model = load_mjcf(xml_path=xml) if from_path else load_mjcf(xml_string=xml)

    rng = np.random.default_rng(3)
    for trial in range(3):
        qpos, qvel = random_state(m, rng, free_height=3.0)
        ctrl = rng.uniform(-0.5, 0.5, size=m.nu)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        assert d.ncon == 0, "test states must be contact-free"

        qacc, _ = engine.forward_dynamics(
            model,
            jnp.asarray(qpos, jnp.float32)[None],
            jnp.asarray(qvel, jnp.float32)[None],
            jnp.asarray(ctrl, jnp.float32)[None],
            include_contacts=False,
        )
        scale = np.maximum(np.abs(np.asarray(d.qacc)), 1.0)
        np.testing.assert_allclose(
            np.asarray(qacc[0]) / scale, np.asarray(d.qacc) / scale, atol=5e-2,
        )


def test_ant_drop_is_stable():
    """Drop the ant from its home keyframe; penalty contacts must keep it on
    the floor without blow-up over 2 seconds of simulated time."""
    model = load_mjcf(xml_path=ANT_XML, keyframe="home")
    B = 4
    qpos = jnp.tile(jnp.asarray(model.qpos0)[None], (B, 1))
    qvel = jnp.zeros((B, model.nv))
    ctrl = jnp.tile(jnp.asarray(model.qpos0[7:])[None], (B, 1))  # hold nominal pose

    step = jax.jit(lambda qp, qv: engine.step(model, qp, qv, ctrl, nr_substeps=4))
    for _ in range(100):  # 100 * 4 * 0.005s = 2s
        qpos, qvel = step(qpos, qvel)
    z = np.asarray(qpos[:, 2])
    assert np.isfinite(np.asarray(qpos)).all() and np.isfinite(np.asarray(qvel)).all()
    assert (z > 0.15).all() and (z < 1.0).all(), z
    # roughly upright: quaternion w component dominant
    assert (np.abs(np.asarray(qpos[:, 3])) > 0.8).all()


def test_free_fall_matches_gravity():
    model = load_mjcf(xml_string=TEST_XML)
    qpos = jnp.asarray(model.qpos0)[None]
    qvel = jnp.zeros((1, model.nv))
    qacc, _ = engine.forward_dynamics(
        model, qpos, qvel, jnp.zeros((1, 3)), include_contacts=False
    )
    # at rest with zero ctrl, base linear acceleration ~ gravity (internal
    # joint damping is zero at rest)
    np.testing.assert_allclose(np.asarray(qacc[0, :3]), [0, 0, -9.81], atol=1e-2)


BALL_XML = """
<mujoco model="ball">
  <option timestep="0.005"/>
  <worldbody>
    <body name="ball" pos="0 0 0.5">
      <joint type="free"/>
      <geom name="b" type="sphere" size="0.1" density="1000"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_domain_params_mass_and_gravity():
    model = load_mjcf(xml_string=BALL_XML)
    B = 4
    qpos = jnp.tile(jnp.asarray(model.qpos0)[None], (B, 1))
    qvel = jnp.zeros((B, model.nv))
    ctrl = jnp.zeros((B, 0))

    # mass scaling leaves free fall unchanged (gravity is mass-independent)
    dr = engine.DomainParams(mass_scale=jnp.ones((model.nbody, B)) * 2.0)
    qacc, _ = engine.forward_dynamics(model, qpos, qvel, ctrl, include_contacts=False, dr=dr)
    np.testing.assert_allclose(np.asarray(qacc[:, 2]), -9.81, rtol=1e-4)

    # per-env gravity override changes the z acceleration per env
    gz = jnp.asarray([-9.81, -4.0, -1.0, 0.0])
    gravity = jnp.stack([jnp.zeros(B), jnp.zeros(B), gz])
    qacc, _ = engine.forward_dynamics(
        model, qpos, qvel, ctrl, include_contacts=False,
        dr=engine.DomainParams(gravity=gravity),
    )
    np.testing.assert_allclose(np.asarray(qacc[:, 2]), np.asarray(gz), rtol=1e-4, atol=1e-5)


def test_terrain_rest_height_tracks_heightfield():
    model = load_mjcf(xml_string=BALL_XML)
    B = 2
    n, half = 16, 2.0
    # env 0: flat ground at 0; env 1: plateau at 0.3 m everywhere
    height = jnp.stack([jnp.zeros(n * n), jnp.full((n * n,), 0.3)], axis=-1)
    terrain = engine.Terrain(height=height, n=n, half_extent_m=half)

    h = engine.terrain_height_T(terrain, jnp.zeros((1, B)), jnp.zeros((1, B)))
    np.testing.assert_allclose(np.asarray(h[0]), [0.0, 0.3], atol=1e-6)

    qpos = jnp.tile(jnp.asarray(model.qpos0)[None], (B, 1))
    qpos = qpos.at[:, 2].set(jnp.asarray([0.5, 0.8]))
    qvel = jnp.zeros((B, model.nv))
    ctrl = jnp.zeros((B, 0))

    def body(carry, _):
        qpos, qvel = carry
        return engine.step(model, qpos, qvel, ctrl, nr_substeps=1, terrain=terrain), None

    (qpos, qvel), _ = jax.lax.scan(body, (qpos, qvel), None, 600)
    rest_z = np.asarray(qpos[:, 2])
    # each ball should rest ~one radius above its local ground
    assert abs(rest_z[0] - 0.1) < 0.03, rest_z
    assert abs(rest_z[1] - 0.4) < 0.03, rest_z


def test_ctrl_sequence_substeps_match_manual_stepping():
    model = load_mjcf(xml_string=TEST_XML)
    B = 3
    rng = np.random.default_rng(0)
    qpos = jnp.tile(jnp.asarray(model.qpos0)[None], (B, 1))
    qvel = jnp.asarray(rng.normal(size=(B, model.nv)) * 0.1, dtype=jnp.float32)
    ctrls = jnp.asarray(rng.normal(size=(4, B, 3)), dtype=jnp.float32)

    qp1, qv1 = engine.step(model, qpos, qvel, ctrls[0], nr_substeps=4, ctrl_sequence=ctrls)
    qp2, qv2 = qpos, qvel
    for k in range(4):
        qp2, qv2 = engine.step(model, qp2, qv2, ctrls[k], nr_substeps=1)
    np.testing.assert_allclose(np.asarray(qp1), np.asarray(qp2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(qv1), np.asarray(qv2), atol=1e-5)
