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


def test_async_skipping_bridge():
    """Thread-pool stepping with skipping: slow envs get dummy results and
    their in-flight steps land before the next action applies."""
    import time

    env = HostGymEnv("Pendulum-v1", nr_envs=4, seed=0,
                     async_workers=4, async_skip_percentage=0.5)
    # make env 0 artificially slow
    inner0 = env._envs[0]
    original_step = inner0.step

    def slow_step(action):
        time.sleep(0.05)
        return original_step(action)

    inner0.step = slow_step
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    skipped_seen = False
    prev_obs = np.asarray(state.observation[0])
    for _ in range(6):
        state = step(state, jnp.zeros((4, 1)))
        obs0 = np.asarray(state.observation[0])
        if np.allclose(obs0, prev_obs) and float(state.reward[0]) == 0.0:
            skipped_seen = True
        prev_obs = obs0
    assert skipped_seen
    assert np.isfinite(np.asarray(state.observation)).all()
    env.close()


def test_ppo_on_host_env_dp2():
    """dp>1 host envs: the io_callback is pinned to device 0 with unordered
    tokens so the fused program SPMD-partitions over the virtual mesh."""
    config = make_config(
        "ppo.tpu",
        "gym.classic.pendulum_v1.host",
        **{
            "algorithm.total_timesteps": 2 * 8 * 8,
            "algorithm.nr_steps": 8,
            "algorithm.minibatch_size": 16,
            "algorithm.nr_epochs": 1,
            "algorithm.evaluation_active": False,
            "environment.nr_envs": 8,
            "runner.mesh_dp": 2,
        },
    )
    model = create_model(config)
    assert model.mesh.shape["dp"] == 2
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    model.train_env.close()


def test_process_vectorization_end_to_end():
    """forkserver worker processes + shared-memory observations behind the
    bridge (reference AsyncVectorEnvWithSkipping equivalent)."""
    from rlx_tpu.environments.gym.host_bridge import HostGymEnv

    env = HostGymEnv("Pendulum-v1", 4, vectorization="process")
    try:
        state = env.reset(jax.random.PRNGKey(0))
        assert np.asarray(state.observation).shape == (4, 3)
        step = jax.jit(env.step)
        for i in range(205):  # crosses the 200-step horizon -> autoreset
            action = jnp.zeros((4, 1))
            state = step(state, action)
        assert np.isfinite(np.asarray(state.observation)).all()
        # an episode completed: stats must be nonzero (pendulum returns < 0)
        assert (np.asarray(state.info["rollout/episode_return"]) < 0.0).all()
        assert (np.asarray(state.info["rollout/episode_length"]) == 200.0).all()
    finally:
        env.close()


def test_process_vectorization_with_skipping():
    from rlx_tpu.environments.gym.process_pool import ProcessEnvPool
    import gymnasium as gym
    import time

    class SlowWrapper(gym.Wrapper):
        def __init__(self, env, delay):
            super().__init__(env)
            self.delay = delay

        def step(self, action):
            time.sleep(self.delay)
            return self.env.step(action)

    fns = [lambda d=d: SlowWrapper(gym.make("Pendulum-v1"), d)
           for d in (0.0, 0.0, 0.0, 0.3)]
    pool = ProcessEnvPool(fns, (3,), np.float32, skip_percentage=0.25)
    try:
        pool.reset(0)
        start = time.time()
        for _ in range(3):
            out = pool.step([np.zeros(1, np.float32)] * 4)
        elapsed = time.time() - start
        # without skipping 3 steps of the slow env cost >= 0.9 s; skipping
        # must keep the fast envs moving
        assert elapsed < 0.85, elapsed
    finally:
        pool.close()
