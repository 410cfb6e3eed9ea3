"""Unitree Go2 / G1 robot models: golden dynamics checks vs MuJoCo C and
locomotion-env integration (reference robots:
`rl_x/environments/custom_mujoco/robot_locomotion/robots/{unitree_go2,unitree_g1}`)."""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from rlx_tpu.physics import engine, load_mjcf

_ROBOTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rlx_tpu", "environments", "locomotion", "robot", "robots",
)
GO2_XML = os.path.join(_ROBOTS, "unitree_go2.xml")
G1_XML = os.path.join(_ROBOTS, "unitree_g1.xml")


def random_state(m, rng, free_height=3.0):
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
            margin = 0.2 * (hi - lo)
            qpos[adr] = rng.uniform(lo + margin, hi - margin)
    return qpos, qvel


@pytest.mark.parametrize("xml", [GO2_XML, G1_XML], ids=["go2", "g1"])
@pytest.mark.slow
def test_mass_matrix_and_bias_match_mujoco(xml):
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    model = load_mjcf(xml_path=xml)

    rng = np.random.default_rng(11)
    for _ in range(3):
        qpos, qvel = random_state(m, rng)
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


@pytest.mark.parametrize("xml", [GO2_XML, G1_XML], ids=["go2", "g1"])
def test_home_keyframe_fk_matches_mujoco(xml):
    """Golden FK: every body position/orientation in the home pose matches
    MuJoCo C."""
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    model = load_mjcf(xml_path=xml, keyframe="home")
    d.qpos[:] = np.asarray(model.qpos0)
    mujoco.mj_forward(m, d)

    R, p = engine.kinematics(model, jnp.asarray(np.asarray(model.qpos0))[None])
    # engine body order mirrors MJCF body order (world excluded in mujoco's 0)
    np.testing.assert_allclose(np.asarray(p[0]), d.xpos[1:], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(R[0]), d.xmat[1:].reshape(-1, 3, 3), atol=1e-5
    )


@pytest.mark.parametrize("robot,nu,nf_groups", [("go2", 12, 4), ("g1", 29, 2)])
def test_robot_env_builds_and_steps(robot, nu, nf_groups):
    from rlx_tpu.config import make_config
    from rlx_tpu.environments.environment_manager import get_environment_create_env

    config = make_config(
        "ppo.tpu", "locomotion.robot.tpu",
        **{"environment.nr_envs": 2, "environment.robot": robot,
           "environment.episode_length_in_seconds": 1},
    )
    env, _ = get_environment_create_env("locomotion.robot.tpu")(config)
    assert env.single_action_space.shape[0] == nu
    assert len(env.foot_groups) == nf_groups

    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    action = jnp.broadcast_to(env.single_action_space.center, (2, nu))
    for _ in range(5):
        state = step(state, action)
    assert np.isfinite(np.asarray(state.observation)).all()
    assert np.isfinite(np.asarray(state.reward)).all()


@pytest.mark.parametrize("robot", ["go2", "g1"])
@pytest.mark.slow
def test_home_pose_is_statically_stable(robot):
    """Standing at the home keyframe with nominal PD targets must stay
    upright for one simulated second."""
    from rlx_tpu.config import make_config
    from rlx_tpu.environments.environment_manager import get_environment_create_env

    config = make_config(
        "ppo.tpu", "locomotion.robot.tpu",
        **{"environment.nr_envs": 2, "environment.robot": robot,
           "environment.episode_length_in_seconds": 2,
           "environment.terrain.type": "plane"},
    )
    env, _ = get_environment_create_env("locomotion.robot.tpu")(config)
    # train mode at curriculum 0: the reset pose is the (near-)nominal home
    state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    action = jnp.broadcast_to(env.single_action_space.center, (2, env.nr_actuator_joints))
    for _ in range(50):  # 1 s at 50 Hz
        state = step(state, action)
    height = np.asarray(state.physics["internal"]["imu_height_over_ground"])
    assert (height > 0.6 * env.nominal_imu_height_over_ground).all(), height
