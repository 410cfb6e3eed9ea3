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

Vectorization modes: "sync" (in-process loop; optional thread pool via
``async_workers``) or "process" (one forkserver worker per env with
shared-memory observations and slow-env skipping — the reference's
AsyncVectorEnvWithSkipping equivalent, `process_pool.py`).

dp>1: the step/reset callbacks are pinned to device 0 with unordered
tokens, so the fused program stays SPMD-partitionable over the mesh (the
env batch is gathered to the callback and re-sharded on return).  On
multi-host pods the host loop still runs on process 0 only — true
per-host sharded stepping would shard_map the callback region.
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
                 async_workers=0, async_skip_percentage=0.0, env_fns=None,
                 vectorization="sync"):
        import gymnasium as gym

        self.env_id = env_id
        self.nr_envs = nr_envs
        if env_fns is None:
            env_kwargs = env_kwargs or {}
            env_fns = [
                (lambda eid=env_id, kw=env_kwargs: gym.make(eid, **kw))
                for _ in range(nr_envs)
            ]
        self._env_fns = env_fns
        # "process" defers env construction to the workers; other modes own
        # in-process env objects
        self._vectorization = vectorization
        if vectorization == "process":
            self._envs = []
            probe = env_fns[0]()  # spaces/spec probe only
            self._probe_env = probe
        else:
            self._envs = [fn() for fn in env_fns]
            self._probe_env = self._envs[0]
        self._proc_pool = None
        self._proc_skip = async_skip_percentage
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

        env0 = self._probe_env
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

    def _ensure_proc_pool(self):
        if self._proc_pool is None:
            from rlx_tpu.environments.gym.process_pool import ProcessEnvPool

            # the probe env's slot is owned by worker 0 from here on
            self._probe_env.close()
            self._proc_pool = ProcessEnvPool(
                self._env_fns, self.single_observation_space.shape,
                self._obs_dtype, self._proc_skip,
            )

    # ------------------------------------------------------------- host side
    def _host_reset(self, seed):
        if self._vectorization == "process":
            self._ensure_proc_pool()
            out = self._proc_pool.reset(seed)
            self._episode_return[:] = 0.0
            self._episode_length[:] = 0.0
            self._last_stats[:] = 0.0
            self._last_obs = out.copy()
            return out
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
        if self._vectorization == "process":
            actions = np.asarray(actions)
            if self._discrete:
                actions = [int(a) for a in actions]
            obs, final, reward, terminated, truncated, stats = self._proc_pool.step(actions)
            done = terminated | truncated
            self._last_stats[done] = stats[done]
            return obs, final, reward, terminated, truncated, self._last_stats.copy()
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
    def _ordered_callbacks(self):
        """Ordered callbacks carry a replicated token XLA's SPMD partitioner
        rejects; at dp>1 the env-state data-dependency chain (obs -> action
        -> step) already serializes the calls, so ordering is dropped."""
        return len(jax.devices()) == 1

    def _callback_sharding(self):
        """Pin the host callback to one device so the fused program stays
        SPMD-partitionable at dp>1: XLA gathers the sharded action to this
        device, the host steps ALL envs there, and the returned batch is
        re-sharded by the surrounding constraints.  (True per-host sharded
        stepping on multi-host pods would shard_map the callback; single-
        controller runs only need the pin.)"""
        return jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def reset(self, key, eval_mode=False):
        import jax.experimental

        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        observation = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct(self._obs_shape, self._obs_dtype),
            seed,
            ordered=self._ordered_callbacks(),
            sharding=self._callback_sharding(),
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
            jax.experimental.io_callback(
                self._host_step, out_specs, action,
                ordered=self._ordered_callbacks(),
                sharding=self._callback_sharding(),
            )
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
        if self._proc_pool is not None:
            self._proc_pool.close()
