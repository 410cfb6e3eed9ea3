"""Variant algorithms: ESPO early stopping, SimBa nets, HL-Gauss DQN,
history-window and memory-actions wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.environments.classic.pendulum.tpu.environment import Pendulum
from rlx_tpu.environments.wrappers import MemoryActionsWrapper, ObservationWindowWrapper


def test_observation_window_wrapper_shifts_and_resets():
    env = ObservationWindowWrapper(Pendulum(nr_envs=2, horizon=3), window_length=3)
    assert env.single_observation_space.shape == (9,)
    state = env.reset(jax.random.PRNGKey(0))
    first_obs = np.asarray(state.observation).reshape(2, 3, 3)
    # freshly reset: all window slots equal
    assert np.allclose(first_obs[:, 0], first_obs[:, 1])

    step = jax.jit(env.step)
    state1 = step(state, jnp.zeros((2, 1)))
    w1 = np.asarray(state1.observation).reshape(2, 3, 3)
    # newest slot differs from the (repeated) old slots
    assert not np.allclose(w1[:, 2], w1[:, 0])
    # horizon=3 -> third step truncates and refreshes the window
    state2 = step(step(state1, jnp.zeros((2, 1))), jnp.zeros((2, 1)))
    assert bool(state2.truncated.all())
    w = np.asarray(state2.observation).reshape(2, 3, 3)
    assert np.allclose(w[:, 0], w[:, 1]) and np.allclose(w[:, 1], w[:, 2])
    # final_observation keeps the pre-reset trajectory window
    fw = np.asarray(state2.final_observation).reshape(2, 3, 3)
    assert not np.allclose(fw[:, 0], fw[:, 2])


def test_memory_actions_wrapper_carries_memory():
    env = MemoryActionsWrapper(Pendulum(nr_envs=2, horizon=10), memory_dimension=2)
    assert env.single_action_space.shape == (3,)
    assert env.single_observation_space.shape == (5,)
    state = env.reset(jax.random.PRNGKey(0))
    action = jnp.concatenate([jnp.zeros((2, 1)), jnp.array([[0.3, -0.7], [0.9, 0.1]])], axis=-1)
    state = jax.jit(env.step)(state, action)
    np.testing.assert_allclose(np.asarray(state.observation[:, 3:]),
                               [[0.3, -0.7], [0.9, 0.1]], atol=1e-6)


@pytest.mark.parametrize("algorithm,env,extra", [
    ("espo.tpu", "classic.pendulum.tpu", {}),
    ("simba.tpu", "classic.pendulum.tpu", {
        "algorithm.learning_starts": 128, "algorithm.buffer_size": 2048,
        "algorithm.batch_size": 32, "algorithm.logging_frequency": 64,
        "algorithm.policy_hidden_dim": 16, "algorithm.policy_nr_blocks": 1,
        "algorithm.critic_hidden_dim": 16, "algorithm.critic_nr_blocks": 1,
    }),
    ("ppo_history_window.tpu", "classic.pendulum.tpu", {"algorithm.window_length": 4}),
    ("ppo_memory_actions.tpu", "classic.pendulum.tpu", {"algorithm.memory_action_dimension": 3}),
    ("dqn_hl_gauss.tpu", "classic.cart_pole.tpu", {
        "algorithm.learning_starts": 128, "algorithm.buffer_size": 2048,
        "algorithm.batch_size": 32, "algorithm.logging_frequency": 64,
        "algorithm.update_frequency": 1, "algorithm.target_update_frequency": 64,
        "algorithm.nr_atoms": 21, "algorithm.critic_hidden_sizes": (32,),
    }),
])
def test_variant_trains(algorithm, env, extra):
    base = {
        "algorithm.total_timesteps": 512,
        "environment.nr_envs": 8,
        "runner.mesh_dp": -1,
    }
    if algorithm in ("espo.tpu", "ppo_history_window.tpu", "ppo_memory_actions.tpu"):
        base.update({
            "algorithm.nr_steps": 16,
            "algorithm.minibatch_size": 32,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_active": False,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
        })
    base.update(extra)
    model = create_model(make_config(algorithm, env, **base))
    model.train()
    states = getattr(model, "states", None)
    leaves = jax.tree.leaves(states if states is not None else
                             (model.policy_state.params, model.critic_state.params))
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all(), algorithm


def test_reppo_trains():
    config = make_config(
        "reppo.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 512,
            "algorithm.nr_steps": 16,
            "algorithm.nr_minibatches": 2,
            "algorithm.nr_epochs": 2,
            "algorithm.nr_kl_samples": 4,
            "algorithm.nr_bins": 21,
            "algorithm.policy_hidden_dim": 32,
            "algorithm.critic_hidden_dim": 32,
            "algorithm.evaluation_active": False,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves((model.policy_state.params, model.critic_state.params)):
        assert np.isfinite(np.asarray(leaf)).all()
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_domain_randomization_wrapper():
    from rlx_tpu.environments.wrappers import DomainRandomizationWrapper

    env = DomainRandomizationWrapper(
        Pendulum(nr_envs=4, horizon=20), observation_noise_std=0.1, action_delay_chance=1.0
    )
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # delay chance 1.0: first step replays the zero init action regardless of input
    s1 = step(state, jnp.full((4, 1), 2.0))
    s1_ref = step(state, jnp.full((4, 1), -2.0))
    np.testing.assert_allclose(
        np.asarray(s1.physics["inner"].theta_dot), np.asarray(s1_ref.physics["inner"].theta_dot),
        atol=1e-6,
    )
    # observation noise present
    clean = jnp.stack([jnp.cos(s1.physics["inner"].theta), jnp.sin(s1.physics["inner"].theta),
                       s1.physics["inner"].theta_dot], axis=-1)
    assert not np.allclose(np.asarray(s1.observation), np.asarray(clean))


def test_ant_randomization_options():
    from rlx_tpu.environments.locomotion.ant.tpu.environment import Ant

    env = Ant(nr_envs=4, horizon=20, initial_state_noise=0.05,
              perturbation_chance=0.5, perturbation_velocity=1.0)
    state = env.reset(jax.random.PRNGKey(0))
    # reset poses differ across envs under initial-state noise
    qpos = np.asarray(state.physics.qpos)
    assert not np.allclose(qpos[0, 7:], qpos[1, 7:])
    step = jax.jit(env.step)
    for _ in range(10):
        state = step(state, jnp.zeros((4, 8)))
    assert np.isfinite(np.asarray(state.observation)).all()
