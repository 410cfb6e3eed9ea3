"""Adapter: brax-style mujoco_playground envs -> rlx_tpu device-env protocol.

Re-covers the reference's playground integration
(`rl_x/environments/mujoco_playground/g1_joystick_flat_terrain/mjx/wrappers.py:26-79`)
for the rlx_tpu contract: the playground env (already wrapped by
``mujoco_playground.wrapper.wrap_for_brax_training`` — vmapped, episodic,
auto-resetting) exposes ``reset(key) -> State`` / ``step(state, action) ->
State`` with ``obs = {"state", "privileged_state"}``, ``done``, ``metrics``
and ``info["truncation"]``; this adapter presents it as a batched-native
rlx_tpu env (EnvState fields + asymmetric observation indices: the policy
slice is the prefix of the privileged vector, exactly as the reference
relies on).

mujoco_playground is NOT installed in this image, so the adapter is written
against the protocol and unit-tested with a stub env
(tests/test_playground_adapter.py); the registration module gates the
import with a clear error.

Known parity note: like the reference, ``final_observation`` mirrors
``observation`` (the brax-style auto-reset hides the pre-reset obs), so
bootstrap-on-truncation uses the post-reset obs — the reference has the
same approximation (`wrappers.py:41-42`, next == actual_next).
"""

import jax.numpy as jnp
import numpy as np
from flax import struct

from rlx_tpu.environments.spaces import BoxSpace
from rlx_tpu.environments.types import (
    ActionSpaceType,
    DataInterfaceType,
    ObservationSpaceType,
    SimulationType,
)


@struct.dataclass
class PlaygroundState:
    env_state: object
    observation: jnp.ndarray
    final_observation: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: dict
    episode_store: dict
    key: jnp.ndarray
    eval_mode: bool = struct.field(pytree_node=False, default=False)


class GeneralProperties:
    action_space_type = ActionSpaceType.CONTINUOUS
    observation_space_type = ObservationSpaceType.FLAT_VALUES
    data_interface_type = DataInterfaceType.JAX
    simulation_type = SimulationType.DEVICE


class PlaygroundAdapter:
    """Wraps a brax-training-wrapped playground env for rlx_tpu algorithms."""

    general_properties = GeneralProperties

    def __init__(self, env, nr_envs, horizon, action_center=None, action_scale=None):
        self.env = env
        self.nr_envs = nr_envs
        self.horizon = horizon

        obs_size = env.observation_size
        if isinstance(obs_size, dict):
            policy_dim = int(np.asarray(obs_size["state"]).reshape(-1)[0])
            critic_dim = int(np.asarray(obs_size["privileged_state"]).reshape(-1)[0])
            self._obs_key = "privileged_state"
        else:  # plain vector observations: symmetric actor/critic
            policy_dim = critic_dim = int(obs_size)
            self._obs_key = None

        action_dim = int(env.action_size)
        self.single_action_space = BoxSpace(
            low=-1.0, high=1.0, shape=(action_dim,),
            center=(jnp.zeros(action_dim) if action_center is None else jnp.asarray(action_center)),
            scale=(jnp.ones(action_dim) if action_scale is None else jnp.asarray(action_scale)),
        )
        self.single_observation_space = BoxSpace(
            low=-np.inf, high=np.inf, shape=(critic_dim,)
        )
        # the policy observation is the PREFIX of the privileged vector
        # (reference `wrappers.py:22-24`)
        self.policy_observation_indices = jnp.arange(policy_dim)
        self.critic_observation_indices = jnp.arange(critic_dim)

    def _obs(self, env_state):
        obs = env_state.obs
        return obs[self._obs_key] if self._obs_key is not None else obs

    def reset(self, key, eval_mode=False):
        env_state = self.env.reset(key)
        zeros = jnp.zeros(self.nr_envs)
        falses = jnp.zeros(self.nr_envs, bool)
        obs = self._obs(env_state)
        info = {
            "rollout/episode_return": zeros,
            "rollout/episode_length": zeros,
            **{f"env_info/{k}": v for k, v in env_state.metrics.items()},
        }
        return PlaygroundState(
            env_state=env_state, observation=obs, final_observation=obs,
            reward=jnp.zeros(self.nr_envs), terminated=falses, truncated=falses,
            info=info,
            episode_store={"episode_return": zeros, "episode_length": zeros},
            key=key, eval_mode=eval_mode,
        )

    def step(self, state, action):
        action = jnp.clip(action, -1.0, 1.0)
        env_state = self.env.step(state.env_state, action)
        done = env_state.done.astype(bool)
        truncated = env_state.info["truncation"].astype(bool)
        terminated = done & (~truncated)

        episode_return = state.episode_store["episode_return"] + env_state.reward
        episode_length = state.episode_store["episode_length"] + 1.0
        info = {
            "rollout/episode_return": jnp.where(
                done, episode_return, state.info["rollout/episode_return"]
            ),
            "rollout/episode_length": jnp.where(
                done, episode_length, state.info["rollout/episode_length"]
            ),
            **{f"env_info/{k}": v for k, v in env_state.metrics.items()},
        }
        obs = self._obs(env_state)
        return state.replace(
            env_state=env_state,
            observation=obs,
            final_observation=obs,  # see module docstring: reference parity
            reward=env_state.reward,
            terminated=terminated,
            truncated=truncated,
            info=info,
            episode_store={
                "episode_return": jnp.where(done, 0.0, episode_return),
                "episode_length": jnp.where(done, 0.0, episode_length),
            },
        )

    def close(self):
        pass
