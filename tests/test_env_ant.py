"""Ant env: shapes, reward semantics, stability under random actions, and
PPO-on-Ant smoke over the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.locomotion.ant.tpu.environment import Ant


def test_ant_env_contract():
    env = Ant(nr_envs=4, horizon=50)
    assert env.single_observation_space.shape == (34,)
    assert env.single_action_space.shape == (8,)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (4, 34)
    # home keyframe: standing height in obs
    np.testing.assert_allclose(np.asarray(state.observation[:, 0]), 0.61, atol=1e-5)

    step = jax.jit(env.step)
    state = step(state, jnp.zeros((4, 8)))
    assert state.observation.shape == (4, 34)
    assert np.isfinite(np.asarray(state.observation)).all()
    # standing still: zero xy velocity => tracking reward = exp(-4/0.25) ~ 0
    assert (np.asarray(state.reward) >= 0.0).all()
    assert (np.asarray(state.reward) < 0.1).all()
    assert not np.asarray(state.terminated).any()


def test_ant_random_actions_stable():
    env = Ant(nr_envs=8, horizon=100)
    state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(2)
    for _ in range(50):
        key, akey = jax.random.split(key)
        action = jax.random.uniform(akey, (8, 8), minval=-1.0, maxval=1.0)
        state = step(state, action)
    assert np.isfinite(np.asarray(state.observation)).all()
    assert np.isfinite(np.asarray(state.physics.qvel)).all()
    # torso stays below 100 m/s — no energy blow-up
    assert np.abs(np.asarray(state.physics.qvel)).max() < 100.0


def test_ppo_on_ant_mesh_smoke():
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "ppo.tpu",
        "locomotion.ant.tpu",
        **{
            "environment.nr_envs": 8,
            "environment.horizon": 32,
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


def test_ant_action_space_bounds_are_per_hinge():
    env = Ant(nr_envs=1, horizon=10)
    low = np.asarray(env.single_action_space.low)
    high = np.asarray(env.single_action_space.high)
    assert low.shape == (8,) and high.shape == (8,)
    assert (high > low).all()  # every hinge has a real range
    # hip range +-30deg, ankle ranges 30..70deg magnitudes
    assert np.isclose(np.abs(low).max(), np.radians(70), atol=1e-4)
