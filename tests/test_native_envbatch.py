"""Native C++ env batcher: builds, matches the device Pendulum dynamics,
auto-resets, and trains PPO through io_callback."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.native.batcher import NativeEnvBatch


def test_native_pendulum_matches_device_math():
    env = NativeEnvBatch("pendulum", nr_envs=3, seed=7)
    state = env.reset(jax.random.PRNGKey(0))
    obs0 = np.asarray(state.observation)
    theta = np.arctan2(obs0[:, 1], obs0[:, 0])
    theta_dot = obs0[:, 2]
    action = np.array([[1.0], [-2.0], [0.3]], np.float32)
    state = jax.jit(env.step)(state, jnp.asarray(action))
    g, m, l, dt = 10.0, 1.0, 1.0, 0.05
    for i in range(3):
        u = np.clip(action[i, 0], -2, 2)
        angle = ((theta[i] + np.pi) % (2 * np.pi)) - np.pi
        exp_reward = -(angle**2 + 0.1 * theta_dot[i] ** 2 + 0.001 * u**2)
        new_theta_dot = np.clip(theta_dot[i] + (3 * g / (2 * l) * np.sin(theta[i]) + 3 / (m * l**2) * u) * dt, -8, 8)
        new_theta = theta[i] + new_theta_dot * dt
        assert np.isclose(float(state.reward[i]), exp_reward, atol=1e-4)
        assert np.isclose(float(state.observation[i, 2]), new_theta_dot, atol=1e-4)
        assert np.isclose(float(state.observation[i, 0]), np.cos(new_theta), atol=1e-4)
    env.close()


def test_native_cartpole_autoreset_and_stats():
    env = NativeEnvBatch("cart_pole", nr_envs=2, seed=3)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for t in range(200):
        state = step(state, jnp.zeros(2, jnp.int32))
        done = np.asarray(state.terminated) | np.asarray(state.truncated)
        if done.any():
            i = int(np.argmax(done))
            assert float(state.info["rollout/episode_length"][i]) == t + 1
            break
    else:
        raise AssertionError("no episode finished")
    env.close()


def test_ppo_on_native_env():
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "ppo.tpu",
        "native.pendulum.host",
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
