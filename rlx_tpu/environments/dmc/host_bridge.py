"""DeepMind Control Suite host environments (flat-observation adapter).

Reference analogue: `rl_x/environments/gym/dmc/humanoid_run_v1/` (which goes
through gymnasium+shimmy).  shimmy is not available in this image, so this
adapter wraps `dm_control.suite` directly: observations are flattened and
concatenated, actions pass through, episodes truncate at the suite's own
time limit (dm_control tasks terminate only via LAST timesteps).  Same-step
auto-reset + episode statistics match the device-env protocol.
"""

import os

# dm_control needs a GL backend even without rendering; headless boxes lack X11.
os.environ.setdefault("MUJOCO_GL", "egl")

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.gym.host_bridge import HostEnvState
from rlx_tpu.environments.spaces import BoxSpace


def _flatten_observation(obs_dict):
    return np.concatenate([np.asarray(v, np.float32).reshape(-1) for v in obs_dict.values()])


class DMCHostEnv:
    def __init__(self, domain, task, nr_envs, seed=0):
        from dm_control import suite

        self.nr_envs = nr_envs
        self._envs = [
            suite.load(domain, task, task_kwargs={"random": seed + i})
            for i in range(nr_envs)
        ]
        env0 = self._envs[0]
        ts = env0.reset()
        obs = _flatten_observation(ts.observation)
        self._obs_dim = obs.shape[0]
        spec = env0.action_spec()
        self.single_action_space = BoxSpace(
            low=np.asarray(spec.minimum, np.float32),
            high=np.asarray(spec.maximum, np.float32),
            shape=tuple(spec.shape),
        )
        self.single_observation_space = BoxSpace(
            low=-np.inf, high=np.inf, shape=(self._obs_dim,)
        )
        # control timestep * 1000 steps is the suite default episode limit
        self.horizon = int(env0._step_limit) if hasattr(env0, "_step_limit") else 1000
        self._episode_return = np.zeros(nr_envs)
        self._episode_length = np.zeros(nr_envs)
        self._last_stats = np.zeros((nr_envs, 2), np.float32)

    def _host_reset(self, _seed):
        observations = []
        for i, env in enumerate(self._envs):
            ts = env.reset()
            observations.append(_flatten_observation(ts.observation))
        self._episode_return[:] = 0
        self._episode_length[:] = 0
        self._last_stats[:] = 0
        return np.asarray(observations, np.float32)

    def _host_step(self, actions):
        actions = np.asarray(actions)
        obs_out = np.empty((self.nr_envs, self._obs_dim), np.float32)
        final_out = np.empty_like(obs_out)
        reward = np.empty(self.nr_envs, np.float32)
        terminated = np.zeros(self.nr_envs, bool)
        truncated = np.zeros(self.nr_envs, bool)
        for i, env in enumerate(self._envs):
            ts = env.step(actions[i])
            obs = _flatten_observation(ts.observation)
            final_out[i] = obs
            reward[i] = ts.reward or 0.0
            self._episode_return[i] += reward[i]
            self._episode_length[i] += 1
            if ts.last():
                # dm_control signals episode end via LAST; discount == 0 means
                # a true termination, otherwise a time-limit truncation.
                if ts.discount == 0.0:
                    terminated[i] = True
                else:
                    truncated[i] = True
                self._last_stats[i] = (self._episode_return[i], self._episode_length[i])
                self._episode_return[i] = 0.0
                self._episode_length[i] = 0.0
                ts = env.reset()
                obs = _flatten_observation(ts.observation)
            obs_out[i] = obs
        return obs_out, final_out, reward, terminated, truncated, self._last_stats.copy()

    def reset(self, key, eval_mode=False):
        import jax.experimental

        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        observation = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self.nr_envs, self._obs_dim), jnp.float32),
            seed, ordered=True,
        )
        zeros = jnp.zeros(self.nr_envs)
        falses = jnp.zeros(self.nr_envs, bool)
        return HostEnvState(
            observation=observation, final_observation=observation,
            reward=zeros, terminated=falses, truncated=falses,
            info={"rollout/episode_return": zeros, "rollout/episode_length": zeros},
            key=key, eval_mode=eval_mode,
        )

    def step(self, state, action):
        import jax.experimental

        out_specs = (
            jax.ShapeDtypeStruct((self.nr_envs, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs,), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs,), bool),
            jax.ShapeDtypeStruct((self.nr_envs,), bool),
            jax.ShapeDtypeStruct((self.nr_envs, 2), jnp.float32),
        )
        observation, final_observation, reward, terminated, truncated, stats = (
            jax.experimental.io_callback(self._host_step, out_specs, action, ordered=True)
        )
        return state.replace(
            observation=observation, final_observation=final_observation,
            reward=reward, terminated=terminated, truncated=truncated,
            info={"rollout/episode_return": stats[:, 0], "rollout/episode_length": stats[:, 1]},
        )

    def close(self):
        for env in self._envs:
            env.close()
