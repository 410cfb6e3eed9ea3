"""Composable wrappers over device-resident environments.

TPU-first re-design of two reference memory mechanisms that were baked into
algorithm directories:

- ``ObservationWindowWrapper`` — the fixed window of the last N observations
  of `rl_x/algorithms/ppo_history_window/flax_full_jit/` (window kept as
  part of the env state, refreshed on auto-reset);
- ``MemoryActionsWrapper`` — learned memory through the action space of
  `rl_x/algorithms/ppo_memory_actions/flax_full_jit/policy.py:16,42-52`
  (policy emits extra dims that are appended to the next observation).

As wrappers they compose with EVERY algorithm, not just PPO.
"""

import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.env import EnvState
from rlx_tpu.environments.spaces import BoxSpace


class ObservationWindowWrapper:
    def __init__(self, env, window_length):
        self.env = env
        self.window_length = window_length
        self.nr_envs = env.nr_envs
        self.horizon = env.horizon
        self.obs_dim = int(np.prod(env.single_observation_space.shape))
        self.single_action_space = env.single_action_space
        self.single_observation_space = BoxSpace(
            low=-jnp.inf, high=jnp.inf, shape=(window_length * self.obs_dim,)
        )
        self.general_properties = getattr(env, "general_properties", None)

    def _flat(self, window):
        return window.reshape(self.nr_envs, -1)

    def reset(self, key, eval_mode=False):
        inner = self.env.reset(key, eval_mode)
        window = jnp.repeat(inner.observation[:, None], self.window_length, axis=1)
        obs = self._flat(window)
        return inner.replace(
            physics={"inner": inner.physics, "window": window},
            observation=obs,
            final_observation=obs,
        )

    def step(self, state, action):
        inner_state = state.replace(physics=state.physics["inner"])
        inner = self.env.step(inner_state, action)
        done = inner.terminated | inner.truncated

        prev_window = state.physics["window"]
        final_window = jnp.concatenate(
            [prev_window[:, 1:], inner.final_observation[:, None]], axis=1
        )
        shifted = jnp.concatenate([prev_window[:, 1:], inner.observation[:, None]], axis=1)
        fresh = jnp.repeat(inner.observation[:, None], self.window_length, axis=1)
        window = jnp.where(done[:, None, None], fresh, shifted)

        return inner.replace(
            physics={"inner": inner.physics, "window": window},
            observation=self._flat(window),
            final_observation=self._flat(final_window),
        )

    def close(self):
        self.env.close()


class MemoryActionsWrapper:
    def __init__(self, env, memory_dimension):
        self.env = env
        self.memory_dimension = memory_dimension
        self.nr_envs = env.nr_envs
        self.horizon = env.horizon
        self.obs_dim = int(np.prod(env.single_observation_space.shape))
        inner_as = env.single_action_space
        self.inner_action_dim = int(np.prod(inner_as.shape))
        low = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(inner_as.low, jnp.float32), inner_as.shape).reshape(-1),
            -jnp.ones(memory_dimension),
        ])
        high = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(inner_as.high, jnp.float32), inner_as.shape).reshape(-1),
            jnp.ones(memory_dimension),
        ])
        self.single_action_space = BoxSpace(
            low=low, high=high, shape=(self.inner_action_dim + memory_dimension,)
        )
        self.single_observation_space = BoxSpace(
            low=-jnp.inf, high=jnp.inf, shape=(self.obs_dim + memory_dimension,)
        )
        self.general_properties = getattr(env, "general_properties", None)

    def reset(self, key, eval_mode=False):
        inner = self.env.reset(key, eval_mode)
        memory = jnp.zeros((self.nr_envs, self.memory_dimension))
        obs = jnp.concatenate([inner.observation, memory], axis=-1)
        return inner.replace(
            physics={"inner": inner.physics, "memory": memory},
            observation=obs,
            final_observation=obs,
        )

    def step(self, state, action):
        env_action = action[:, : self.inner_action_dim]
        memory = jnp.clip(action[:, self.inner_action_dim:], -1.0, 1.0)
        inner_state = state.replace(physics=state.physics["inner"])
        inner = self.env.step(inner_state, env_action)
        done = inner.terminated | inner.truncated
        next_memory = jnp.where(done[:, None], 0.0, memory)
        return inner.replace(
            physics={"inner": inner.physics, "memory": next_memory},
            observation=jnp.concatenate([inner.observation, next_memory], axis=-1),
            final_observation=jnp.concatenate([inner.final_observation, memory], axis=-1),
        )

    def close(self):
        self.env.close()
