"""Robot locomotion env family: contract, stability, autoreset/curriculum,
terrain and domain-randomization sanity, PPO-on-robot mesh smoke.

Mirrors the behavior of the reference's largest env family
(`rl_x/environments/custom_mujoco/robot_locomotion/mjx/environment.py`),
which ships without tests; the contracts asserted here are the ones the
algorithms depend on (final_observation bootstrapping, asymmetric obs
indices, curriculum coefficient semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.environments.environment_manager import get_environment_create_env


def _make_env(nr_envs=4, **overrides):
    flat = {"environment.nr_envs": nr_envs}
    flat.update(overrides)
    config = make_config("ppo.tpu", "locomotion.robot.tpu", **flat)
    env, _ = get_environment_create_env("locomotion.robot.tpu")(config)
    return env


@pytest.fixture(scope="module")
def env():
    return _make_env(nr_envs=4, **{"environment.episode_length_in_seconds": 2})


@pytest.fixture(scope="module")
def jit_step(env):
    return jax.jit(env.step)


def test_robot_env_contract(env):
    nu = env.single_action_space.shape[0]
    assert nu == 12  # quadruped
    assert env.nr_feet == 4
    assert env.horizon == 100  # 2 s @ 50 Hz control

    # asymmetric actor/critic observation protocol: valid, and the critic
    # sees privileged channels (imu linear velocity) the policy does not
    n_obs = env.single_observation_space.shape[0]
    pol = np.asarray(env.policy_observation_indices)
    cri = np.asarray(env.critic_observation_indices)
    assert pol.min() >= 0 and pol.max() < n_obs
    assert cri.min() >= 0 and cri.max() < n_obs
    assert len(set(pol.tolist())) == len(pol)
    imu_lin = set(np.asarray(env.imu_linear_vel_obs_idx).tolist())
    assert imu_lin.isdisjoint(set(pol.tolist()))
    assert imu_lin.issubset(set(cri.tolist()))

    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (4, n_obs)
    assert np.isfinite(np.asarray(state.observation)).all()
    # train mode starts at the bottom of the terrain curriculum
    np.testing.assert_array_equal(
        np.asarray(state.physics["internal"]["env_curriculum_coeff"]), 0.0
    )
    # eval mode forces the hardest terrain and full DR
    eval_state = env.reset(jax.random.PRNGKey(0), eval_mode=True)
    np.testing.assert_array_equal(
        np.asarray(eval_state.physics["internal"]["env_curriculum_coeff"]), 1.0
    )


def test_robot_step_semantics(env, jit_step):
    state = env.reset(jax.random.PRNGKey(1))
    nu = env.single_action_space.shape[0]
    state = jit_step(state, jnp.zeros((4, nu)))
    assert np.isfinite(np.asarray(state.observation)).all()
    assert np.isfinite(np.asarray(state.reward)).all()
    # every reward term is logged under the reference's metric namespaces
    for key in env.reward_function_info_keys():
        assert key in state.info, key
        assert np.isfinite(np.asarray(state.info[key])).all(), key
    # standing at nominal pose with zero action: alive but near-zero tracking
    assert not np.asarray(state.terminated).any()


@pytest.mark.slow
def test_robot_random_actions_stable(env, jit_step):
    state = env.reset(jax.random.PRNGKey(2))
    nu = env.single_action_space.shape[0]
    key = jax.random.PRNGKey(3)
    for _ in range(50):
        key, akey = jax.random.split(key)
        action = jax.random.uniform(akey, (4, nu), minval=-1.0, maxval=1.0)
        state = jit_step(state, action)
    assert np.isfinite(np.asarray(state.observation)).all()
    assert np.isfinite(np.asarray(state.physics["qvel"])).all()
    # velocity clipping keeps the sim bounded even under random torque storms
    assert np.abs(np.asarray(state.physics["qvel"])).max() <= 100.0 + 1e-6


def test_robot_autoreset_and_final_observation(env, jit_step):
    """After done, `observation` is the fresh-episode obs while
    `final_observation` keeps the pre-reset obs for bootstrapping — the
    reference's `actual_next_observation` contract
    (`robot_locomotion/mjx/environment.py` _step autoreset)."""
    state = env.reset(jax.random.PRNGKey(4))
    nu = env.single_action_space.shape[0]
    key = jax.random.PRNGKey(5)
    saw_done = False
    for _ in range(env.horizon + 5):
        key, akey = jax.random.split(key)
        action = jax.random.uniform(akey, (4, nu), minval=-1.0, maxval=1.0)
        prev_len = np.asarray(state.episode_store["episode_length"])
        state = jit_step(state, action)
        done = np.asarray(state.terminated | state.truncated)
        if done.any():
            saw_done = True
            i = int(np.argmax(done))
            obs = np.asarray(state.observation[i])
            fin = np.asarray(state.final_observation[i])
            assert not np.allclose(obs, fin)
            # episode accumulators cleared on the done env
            assert np.asarray(state.episode_store["episode_length"])[i] == 0.0
            assert np.asarray(state.episode_store["episode_return"])[i] == 0.0
            # logged episode length is the finished episode's length
            assert np.asarray(state.info["rollout/episode_length"])[i] == prev_len[i] + 1
            break
    assert saw_done, "no episode finished within one horizon of random actions"


def test_robot_terrain_height_query(env):
    state = env.reset(jax.random.PRNGKey(6), eval_mode=True)
    internal = state.physics["internal"]
    x = jnp.linspace(-3.0, 3.0, 16)[None, :].repeat(4, axis=0)
    y = jnp.zeros_like(x)
    h = env.terrain_function.height_at(internal, x, y)
    assert h.shape == (4, 16)
    assert np.isfinite(np.asarray(h)).all()
    # diverse hfield at full curriculum is not flat
    assert np.asarray(h).std() > 0.0


def test_robot_domain_randomization_varies_across_envs(env):
    state = env.reset(jax.random.PRNGKey(7), eval_mode=True)
    internal = state.physics["internal"]
    # per-env model multipliers should differ between envs under forced DR
    varied = 0
    for k in ("seen_mass_scale", "seen_kp_scale", "dr_friction_scale"):
        v = np.asarray(internal[k])
        if np.unique(v.round(6), axis=0).shape[0] > 1:
            varied += 1
    assert varied >= 2, "domain randomization produced identical envs"


@pytest.mark.slow
def test_biped_robot_stands_and_steps():
    """The 10-DoF biped (reference: unitree_g1 robot def) stands under PD
    at the home keyframe and stays finite under random actions."""
    env = _make_env(
        nr_envs=4,
        **{"environment.robot": "biped", "environment.episode_length_in_seconds": 2},
    )
    assert env.single_action_space.shape == (10,)
    assert env.nr_feet == 4  # heel + toe spheres per foot
    # symmetry pairing is left<->right: heel-heel and toe-toe
    pairs = {tuple(p) for p in env.feet_symmetry_pairs.tolist()}
    assert pairs == {(0, 2), (1, 3)}

    state = env.reset(jax.random.PRNGKey(0))
    jit_step = jax.jit(env.step)
    nu = env.single_action_space.shape[0]
    for _ in range(50):  # 1 s of standing at nominal targets
        state = jit_step(state, jnp.zeros((4, nu)))
    assert not np.asarray(state.terminated).any()
    assert (np.asarray(state.physics["qpos"][:, 2]) > 0.45).all()

    key = jax.random.PRNGKey(1)
    for _ in range(50):
        key, akey = jax.random.split(key)
        state = jit_step(state, jax.random.uniform(akey, (4, nu), minval=-1.0, maxval=1.0))
    assert np.isfinite(np.asarray(state.observation)).all()


@pytest.mark.slow
def test_ppo_on_robot_mesh_smoke():
    config = make_config(
        "ppo.tpu",
        "locomotion.robot.tpu",
        **{
            "environment.nr_envs": 8,
            "environment.episode_length_in_seconds": 1,
            "algorithm.total_timesteps": 8 * 16,
            "algorithm.nr_steps": 16,
            "algorithm.minibatch_size": 32,
            "algorithm.nr_epochs": 1,
            "algorithm.evaluation_active": False,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
