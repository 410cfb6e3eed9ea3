"""Gymnasium host environments bridged INTO the fused device program.

The reference runs host envs with a separate host-driven algorithm style per
framework (`rl_x/algorithms/ppo/flax/ppo.py:265-344`: python while-loop,
`jax.device_get` round trips per step).  The TPU build instead keeps ONE
fused program per algorithm and bridges host envs through ordered
``jax.experimental.io_callback``s: the callback does the vectorized
Gymnasium step on host and ships back batched arrays.  Host state (the env
objects) never enters the jit.

Vectorization is an in-process sync loop with SAME-STEP auto-reset managed
here (observation = post-reset, final_observation = pre-reset), matching the
device-env protocol exactly, so every algorithm works unchanged on host
envs.  Episode statistics mirror the reference's RecordEpisodeStatistics
(`rl_x/environments/gym/mujoco/humanoid_v4/wrappers.py:36-58`).

Limitations (documented): host envs run at mesh dp=1 (callbacks are not
sharded across hosts yet); throughput is bound by the host step loop.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rlx_tpu.environments.spaces import BoxSpace, DiscreteSpace


@struct.dataclass
class HostEnvState:
    observation: jax.Array
    final_observation: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    info: Any
    key: jax.Array
    eval_mode: bool = struct.field(pytree_node=False, default=False)


class HostGymEnv:
    """Adapter presenting the device-env protocol over Gymnasium envs.

    ``async_workers > 0`` steps envs on a thread pool and, like the
    reference's AsyncVectorEnvWithSkipping
    (`rl_x/environments/gym/mujoco/humanoid_v4/async_vectorized_wrapper.py:10-90`),
    may SKIP the slowest ``async_skip_percentage`` of envs per step: a
    skipped env returns its previous observation with zero reward and its
    in-flight step is collected before the next action is applied.
    """

    def __init__(self, env_id, nr_envs, seed=0, env_kwargs=None,
                 async_workers=0, async_skip_percentage=0.0, env_fns=None):
        import gymnasium as gym

        self.env_id = env_id
        self.nr_envs = nr_envs
        if env_fns is not None:  # factory path (e.g. wrapped Atari stacks)
            self._envs = [fn() for fn in env_fns]
        else:
            self._envs = [gym.make(env_id, **(env_kwargs or {})) for _ in range(nr_envs)]
        self._seed = seed
        self._episode_return = np.zeros(nr_envs)
        self._episode_length = np.zeros(nr_envs)
        self._last_stats = np.zeros((nr_envs, 2), dtype=np.float32)
        self._async_skip = async_skip_percentage
        self._pool = None
        self._pending = [None] * nr_envs
        self._last_obs = None
        if async_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=async_workers)

        env0 = self._envs[0]
        obs_space = env0.observation_space
        act_space = env0.action_space
        # uint8 image observations stay uint8 across the bridge (4x fewer
        # transfer bytes); networks normalize to float on device.
        self._obs_dtype = np.uint8 if obs_space.dtype == np.uint8 else np.float32
        self.single_observation_space = BoxSpace(
            low=np.asarray(obs_space.low, np.float32),
            high=np.asarray(obs_space.high, np.float32),
            shape=obs_space.shape,
        )
        if hasattr(act_space, "n"):
            self.single_action_space = DiscreteSpace(act_space.n)
            self._discrete = True
        else:
            self.single_action_space = BoxSpace(
                low=np.asarray(act_space.low, np.float32),
                high=np.asarray(act_space.high, np.float32),
                shape=act_space.shape,
            )
            self._discrete = False

        spec_horizon = getattr(env0.spec, "max_episode_steps", None)
        self.horizon = int(spec_horizon or 1000)

        self._obs_shape = (nr_envs,) + tuple(obs_space.shape)

    # ------------------------------------------------------------- host side
    def _host_reset(self, seed):
        observations = []
        for i, env in enumerate(self._envs):
            obs, _ = env.reset(seed=int(seed) + i)
            observations.append(obs)
        self._episode_return[:] = 0.0
        self._episode_length[:] = 0.0
        self._last_stats[:] = 0.0
        out = np.asarray(observations, self._obs_dtype)
        self._last_obs = out.copy()
        return out

    def _host_step(self, actions):
        if self._pool is not None:
            return self._host_step_async(actions)
        actions = np.asarray(actions)
        obs_out = np.empty(self._obs_shape, self._obs_dtype)
        final_out = np.empty(self._obs_shape, self._obs_dtype)
        reward = np.empty(self.nr_envs, np.float32)
        terminated = np.empty(self.nr_envs, bool)
        truncated = np.empty(self.nr_envs, bool)
        for i, env in enumerate(self._envs):
            action = actions[i]
            if self._discrete:
                action = int(action)
            obs, r, term, trunc, info = env.step(action)
            final_out[i] = obs
            reward[i] = r
            terminated[i] = term
            truncated[i] = trunc
            self._episode_return[i] += r
            self._episode_length[i] += 1
            if term or trunc:
                # wrapper-level stats (raw return before clipping/life
                # splits, e.g. Atari EpisodeStatistics) win over the
                # bridge's accumulator
                self._last_stats[i] = (
                    info.get("episode_return", self._episode_return[i]),
                    info.get("episode_length", self._episode_length[i]),
                )
                self._episode_return[i] = 0.0
                self._episode_length[i] = 0.0
                obs, _ = env.reset()
            obs_out[i] = obs
        return (
            obs_out,
            final_out,
            reward,
            terminated,
            truncated,
            self._last_stats.copy(),
        )

    def _step_one(self, i, action):
        env = self._envs[i]
        if self._discrete:
            action = int(action)
        obs, r, term, trunc, info = env.step(action)
        final = obs
        self._episode_return[i] += r
        self._episode_length[i] += 1
        if term or trunc:
            self._last_stats[i] = (
                info.get("episode_return", self._episode_return[i]),
                info.get("episode_length", self._episode_length[i]),
            )
            self._episode_return[i] = 0.0
            self._episode_length[i] = 0.0
            obs, _ = env.reset()
        return np.asarray(obs, self._obs_dtype), np.asarray(final, self._obs_dtype), r, term, trunc

    def _host_step_async(self, actions):
        import time as _time

        actions = np.asarray(actions)
        obs_out = np.empty(self._obs_shape, self._obs_dtype)
        final_out = np.empty(self._obs_shape, self._obs_dtype)
        reward = np.zeros(self.nr_envs, np.float32)
        terminated = np.zeros(self.nr_envs, bool)
        truncated = np.zeros(self.nr_envs, bool)

        # dispatch new steps only for envs whose previous step has landed
        for i in range(self.nr_envs):
            if self._pending[i] is None:
                self._pending[i] = self._pool.submit(self._step_one, i, actions[i])

        max_skipped = int(self.nr_envs * self._async_skip)
        deadline_pending = self.nr_envs
        while True:
            unfinished = [i for i in range(self.nr_envs) if not self._pending[i].done()]
            if len(unfinished) <= max_skipped:
                break
            _time.sleep(0.0005)
            deadline_pending = len(unfinished)
        del deadline_pending

        for i in range(self.nr_envs):
            future = self._pending[i]
            if future.done():
                obs, final, r, term, trunc = future.result()
                obs_out[i], final_out[i] = obs, final
                reward[i], terminated[i], truncated[i] = r, term, trunc
                self._pending[i] = None
            else:
                # skipped: dummy result, step keeps running in the background
                obs_out[i] = self._last_obs[i]
                final_out[i] = self._last_obs[i]
        self._last_obs = obs_out.copy()
        return obs_out, final_out, reward, terminated, truncated, self._last_stats.copy()

    # ----------------------------------------------------------- device side
    def reset(self, key, eval_mode=False):
        import jax.experimental

        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        observation = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct(self._obs_shape, self._obs_dtype),
            seed,
            ordered=True,
        )
        zeros = jnp.zeros(self.nr_envs)
        falses = jnp.zeros(self.nr_envs, bool)
        return HostEnvState(
            observation=observation,
            final_observation=observation,
            reward=zeros,
            terminated=falses,
            truncated=falses,
            info={
                "rollout/episode_return": zeros,
                "rollout/episode_length": zeros,
            },
            key=key,
            eval_mode=eval_mode,
        )

    def step(self, state, action):
        import jax.experimental

        out_specs = (
            jax.ShapeDtypeStruct(self._obs_shape, self._obs_dtype),
            jax.ShapeDtypeStruct(self._obs_shape, self._obs_dtype),
            jax.ShapeDtypeStruct((self.nr_envs,), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs,), bool),
            jax.ShapeDtypeStruct((self.nr_envs,), bool),
            jax.ShapeDtypeStruct((self.nr_envs, 2), jnp.float32),
        )
        observation, final_observation, reward, terminated, truncated, stats = (
            jax.experimental.io_callback(self._host_step, out_specs, action, ordered=True)
        )
        return state.replace(
            observation=observation,
            final_observation=final_observation,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={
                "rollout/episode_return": stats[:, 0],
                "rollout/episode_length": stats[:, 1],
            },
        )

    def close(self):
        for env in self._envs:
            env.close()
