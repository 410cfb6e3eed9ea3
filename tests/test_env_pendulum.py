"""Golden-transition tests: device Pendulum vs Gymnasium Pendulum-v1 math,
plus the auto-reset / final_observation bootstrap protocol."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.classic.pendulum.tpu.environment import Pendulum, PendulumPhysics


def gymnasium_pendulum_step(theta, theta_dot, u):
    g, m, l, dt = 10.0, 1.0, 1.0, 0.05
    u = np.clip(u, -2.0, 2.0)
    angle = ((theta + np.pi) % (2 * np.pi)) - np.pi
    cost = angle**2 + 0.1 * theta_dot**2 + 0.001 * u**2
    new_theta_dot = theta_dot + (3 * g / (2 * l) * np.sin(theta) + 3.0 / (m * l**2) * u) * dt
    new_theta_dot = np.clip(new_theta_dot, -8.0, 8.0)
    new_theta = theta + new_theta_dot * dt
    return new_theta, new_theta_dot, -cost


def test_pendulum_transition_matches_gymnasium_math():
    env = Pendulum(nr_envs=4, horizon=200)
    state = env.reset(jax.random.PRNGKey(0))
    theta = np.asarray(state.physics.theta)
    theta_dot = np.asarray(state.physics.theta_dot)
    action = np.array([[1.3], [-0.7], [2.5], [0.0]], dtype=np.float32)

    new_state = jax.jit(env.step)(state, jnp.asarray(action))

    for i in range(4):
        exp_theta, exp_theta_dot, exp_reward = gymnasium_pendulum_step(
            theta[i], theta_dot[i], action[i, 0]
        )
        assert np.isclose(float(new_state.physics.theta[i]), exp_theta, atol=1e-5)
        assert np.isclose(float(new_state.physics.theta_dot[i]), exp_theta_dot, atol=1e-5)
        assert np.isclose(float(new_state.reward[i]), exp_reward, atol=1e-5)
        # observation reflects new physics
        assert np.isclose(float(new_state.observation[i, 0]), np.cos(exp_theta), atol=1e-5)


def test_pendulum_truncation_and_autoreset():
    env = Pendulum(nr_envs=2, horizon=3)
    state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    action = jnp.zeros((2, 1))

    for t in range(2):
        state = step(state, action)
        assert not bool(state.truncated[0])

    pre_reset = state
    state = step(state, action)
    # horizon hit: truncated, never terminated
    assert bool(state.truncated.all())
    assert not bool(state.terminated.any())
    # episode stats surfaced in info
    assert float(state.info["rollout/episode_length"][0]) == 3.0
    # episode accumulators zeroed by auto-reset
    assert float(state.episode_store["episode_length"][0]) == 0.0
    # final_observation is the pre-reset physics observation (bootstrap target)
    exp_theta, exp_theta_dot, _ = gymnasium_pendulum_step(
        float(pre_reset.physics.theta[0]), float(pre_reset.physics.theta_dot[0]), 0.0
    )
    assert np.isclose(float(state.final_observation[0, 0]), np.cos(exp_theta), atol=1e-5)
    assert np.isclose(float(state.final_observation[0, 2]), exp_theta_dot, atol=1e-5)
    # observation is a fresh reset state, not the old trajectory
    assert not np.allclose(np.asarray(state.observation), np.asarray(state.final_observation))


def test_pendulum_episode_return_accumulates():
    env = Pendulum(nr_envs=1, horizon=5)
    state = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    action = jnp.zeros((1, 1))
    total = 0.0
    for _ in range(5):
        state = step(state, action)
        total += float(state.reward[0])
    assert np.isclose(float(state.info["rollout/episode_return"][0]), total, atol=1e-4)
