"""Host Gymnasium bridge: io_callback stepping inside jitted programs,
same-step autoreset semantics, and PPO/SAC smoke on host envs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.environments.gym.host_bridge import HostGymEnv


def test_bridge_step_inside_jit():
    env = HostGymEnv("Pendulum-v1", nr_envs=3, seed=0)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (3, 3)

    @jax.jit
    def two_steps(state, action):
        state = env.step(state, action)
        state = env.step(state, action)
        return state

    state = two_steps(state, jnp.zeros((3, 1)))
    assert np.isfinite(np.asarray(state.observation)).all()
    assert (np.asarray(state.reward) <= 0.0).all()  # pendulum cost is negative
    env.close()


def test_bridge_autoreset_same_step():
    env = HostGymEnv("CartPole-v1", nr_envs=2, seed=0)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # drive with constant action until at least one env terminates
    done_seen = False
    for t in range(60):
        state = step(state, jnp.zeros(2, jnp.int32))
        done = np.asarray(state.terminated) | np.asarray(state.truncated)
        if done.any():
            done_seen = True
            i = int(np.argmax(done))
            # same-step autoreset: observation fresh, final_observation terminal
            assert not np.allclose(
                np.asarray(state.observation[i]), np.asarray(state.final_observation[i])
            )
            # episode stats surfaced
            assert float(state.info["rollout/episode_length"][i]) == t + 1
            break
    assert done_seen
    env.close()


def test_ppo_on_host_pendulum():
    config = make_config(
        "ppo.tpu",
        "gym.classic.pendulum_v1.host",
        **{
            "algorithm.total_timesteps": 4 * 16 * 2,
            "algorithm.nr_steps": 16,
            "algorithm.minibatch_size": 32,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_active": False,
            "environment.nr_envs": 4,
            "runner.mesh_dp": 1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    model.train_env.close()


def test_sac_on_host_mujoco_hopper():
    config = make_config(
        "sac.tpu",
        "gym.mujoco.hopper_v5.host",
        **{
            "algorithm.total_timesteps": 160,
            "algorithm.learning_starts": 64,
            "algorithm.buffer_size": 1024,
            "algorithm.batch_size": 16,
            "algorithm.logging_frequency": 32,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 4,
            "runner.mesh_dp": 1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.states["policy"].params):
        assert np.isfinite(np.asarray(leaf)).all()
    model.train_env.close()
