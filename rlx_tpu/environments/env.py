"""Device-resident environment protocol (the TPU-native env contract).

Reference contract being re-cut here: the pure-JAX ``State`` dataclass and
in-step auto-reset of `rl_x/environments/custom_mujoco/ant/mjx/state.py:8-17`
and `.../mjx/environment.py:117-154`.

TPU-first design changes vs the reference:

- **Batched-native**: ``reset``/``step`` operate on ``[B, ...]`` arrays with
  vectorized jnp ops and ``jnp.where``-masked auto-reset, instead of
  ``jax.vmap`` over a per-env ``lax.cond``.  Under vmap, cond lowers to a
  select that executes both branches anyway; writing the batch explicitly
  keeps shapes static, lanes full (8x128 VPU tiles), and makes the env-batch
  axis available for sharding over the device mesh ("dp" axis).
- **Single PRNG key per batch step** (split per-purpose, folded per-env where
  independence matters) instead of carrying one key per env.

Field mapping to the reference ``State``:
  observation        <-> next_observation          (post-auto-reset; policy input)
  final_observation  <-> actual_next_observation   (pre-auto-reset; bootstrap value target)
  info               <-> info                      (logging metrics, incl. rollout/*)
  episode_store      <-> info_episode_store        (running return/length accumulators)
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    physics: Any
    observation: jax.Array
    final_observation: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    info: Dict[str, jax.Array]
    episode_store: Dict[str, jax.Array]
    key: jax.Array
    eval_mode: bool = struct.field(pytree_node=False, default=False)


def tree_where(pred, on_true, on_false):
    """Elementwise tree select; ``pred`` is ``[B]`` broadcast over leading axis."""

    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)

    return jax.tree.map(sel, on_true, on_false)


class DeviceEnv:
    """Base class for batched pure-JAX environments.

    Subclasses implement:
      - ``initial_physics(key, eval_mode) -> physics``        (batched ``[B, ...]``)
      - ``observe(physics) -> obs``                            (``[B, obs]``)
      - ``transition(physics, action, key) ->
            (physics, reward, terminated, info)``              (all batched)
    and set ``nr_envs``, ``horizon``, ``single_observation_space``,
    ``single_action_space``.

    The base class owns reset bookkeeping and masked auto-reset, so env code
    is only dynamics + reward + termination.
    """

    nr_envs: int
    horizon: int

    # --- to be provided by subclasses -------------------------------------
    def initial_physics(self, key, eval_mode):
        raise NotImplementedError

    def observe(self, physics):
        raise NotImplementedError

    def transition(self, physics, action, key):
        raise NotImplementedError

    def info_spec(self) -> Dict[str, jax.Array]:
        """Zero-initialized env_info/* metrics (batched)."""
        return {}

    # --- protocol ---------------------------------------------------------
    def reset(self, key, eval_mode=False):
        key, init_key = jax.random.split(key)
        physics = self.initial_physics(init_key, eval_mode)
        observation = self.observe(physics)
        zeros = jnp.zeros(self.nr_envs, dtype=jnp.float32)
        falses = jnp.zeros(self.nr_envs, dtype=bool)
        info = {
            "rollout/episode_return": zeros,
            "rollout/episode_length": zeros,
            **self.info_spec(),
        }
        episode_store = {"episode_return": zeros, "episode_length": zeros}
        return EnvState(
            physics=physics,
            observation=observation,
            final_observation=observation,
            reward=zeros,
            terminated=falses,
            truncated=falses,
            info=info,
            episode_store=episode_store,
            key=key,
            eval_mode=eval_mode,
        )

    def step(self, state, action):
        key, step_key, reset_key = jax.random.split(state.key, 3)

        physics, reward, terminated, env_info = self.transition(state.physics, action, step_key)
        observation = self.observe(physics)

        episode_length = state.episode_store["episode_length"] + 1.0
        episode_return = state.episode_store["episode_return"] + reward
        truncated = (episode_length >= self.horizon) & ~terminated
        done = terminated | truncated

        info = dict(state.info)
        info.update(env_info)
        info["rollout/episode_return"] = jnp.where(done, episode_return, info["rollout/episode_return"])
        info["rollout/episode_length"] = jnp.where(done, episode_length, info["rollout/episode_length"])

        # Masked auto-reset: fresh initial states are generated for the whole
        # batch (cheap for analytic envs) and selected per-env by `done`.
        reset_physics = self.initial_physics(reset_key, state.eval_mode)
        new_physics = tree_where(done, reset_physics, physics)
        done_obs = done.reshape((-1,) + (1,) * (observation.ndim - 1))
        new_observation = jnp.where(done_obs, self.observe(reset_physics), observation)

        episode_store = {
            "episode_return": jnp.where(done, 0.0, episode_return),
            "episode_length": jnp.where(done, 0.0, episode_length),
        }

        return state.replace(
            physics=new_physics,
            observation=new_observation,
            final_observation=observation,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info=info,
            episode_store=episode_store,
            key=key,
        )

    def close(self):
        pass
