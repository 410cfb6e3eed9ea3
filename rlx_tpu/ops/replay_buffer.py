"""On-device circular replay buffer as a pytree of device arrays.

Capability parity with the reference's in-jit buffer
(`rl_x/algorithms/sac/flax_full_jit/sac.py:139-154` alloc, `:199-205` write,
`:281-287` uniform sample), generalized and shared:

- arrays are shaped ``[capacity, nr_envs, ...]``; the ``nr_envs`` axis is the
  mesh "dp" axis, so the buffer lives sharded in HBM across the pod and
  writes are purely local (each device stores its own envs' slice).
- ``sample`` supports two modes:
  * ``shard_local=True`` (TPU default): time indices are drawn globally but
    env indices are drawn *within* each device's shard, so the gather never
    crosses devices — no ICI traffic on the hot path.
  * ``shard_local=False``: the reference's exact uniform (time, env) sampling.
- n-step sampling with write-head truncation patching
  (`rl_x/algorithms/fasttd3/flax_full_jit/fasttd3.py:380-392`) is provided
  for the FastTD3-family recipes.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    data: Dict[str, jax.Array]  # each [capacity, nr_envs, ...]
    pos: jax.Array              # int32 write head
    size: jax.Array             # int32 filled rows

    @property
    def capacity(self):
        return next(iter(self.data.values())).shape[0]

    @property
    def nr_envs(self):
        return next(iter(self.data.values())).shape[1]


def create(capacity, nr_envs, field_specs):
    """``field_specs``: dict name -> (trailing_shape, dtype)."""
    data = {
        name: jnp.zeros((capacity, nr_envs) + tuple(shape), dtype)
        for name, (shape, dtype) in field_specs.items()
    }
    return ReplayBuffer(data=data, pos=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32))


def add(buffer, transition):
    """Write one ``[nr_envs, ...]`` row per field at the write head."""
    data = {
        name: buffer.data[name].at[buffer.pos].set(value)
        for name, value in transition.items()
    }
    return buffer.replace(
        data=data,
        pos=(buffer.pos + 1) % buffer.capacity,
        size=jnp.minimum(buffer.size + 1, buffer.capacity),
    )


def sample(buffer, key, batch_size, shard_local=True, dp_size=1):
    """Uniform sample of ``batch_size`` transitions -> dict of ``[batch, ...]``.

    With ``shard_local`` and ``dp_size > 1``, env indices are stratified so
    index ``i`` of the batch reads from env shard ``i % dp_size`` — combined
    with a batch sharded over dp this keeps every gather device-local.
    """
    time_key, env_key = jax.random.split(key)
    t_idx = jax.random.randint(time_key, (batch_size,), 0, buffer.size)
    if shard_local and dp_size > 1:
        envs_per_shard = buffer.nr_envs // dp_size
        shard = jnp.arange(batch_size) % dp_size
        local = jax.random.randint(env_key, (batch_size,), 0, envs_per_shard)
        e_idx = shard * envs_per_shard + local
    else:
        e_idx = jax.random.randint(env_key, (batch_size,), 0, buffer.nr_envs)
    return {name: arr[t_idx, e_idx] for name, arr in buffer.data.items()}


def sample_nstep(buffer, key, batch_size, n_step, gamma, shard_local=True, dp_size=1):
    """n-step targets from consecutive rows with write-head patching.

    Returns the base transition dict plus ``n_step_reward`` (discounted sum),
    ``n_step_next`` fields, and effective discount ``n_step_gamma``; sequences
    that would cross the write head are truncated at it, and sequences are cut
    at terminations, matching `fasttd3/flax_full_jit/fasttd3.py:380-392`
    semantics.

    Requires fields: 'observation', 'next_observation', 'action', 'reward',
    'terminated', 'truncated'.
    """
    time_key, env_key = jax.random.split(key)
    # Valid start rows: at least n_step rows before the write head when full.
    max_start = jnp.maximum(buffer.size - n_step + 1, 1)
    t0 = jax.random.randint(time_key, (batch_size,), 0, max_start)
    if shard_local and dp_size > 1:
        envs_per_shard = buffer.nr_envs // dp_size
        shard = jnp.arange(batch_size) % dp_size
        local = jax.random.randint(env_key, (batch_size,), 0, envs_per_shard)
        e_idx = shard * envs_per_shard + local
    else:
        e_idx = jax.random.randint(env_key, (batch_size,), 0, buffer.nr_envs)

    # When the buffer is full the circular write head means "row pos-1" is the
    # newest; re-base indices so consecutive t0+k never wraps over the head.
    full = buffer.size >= buffer.capacity
    base = jnp.where(full, buffer.pos, 0)
    rows = (base + t0[:, None] + jnp.arange(n_step)[None, :]) % buffer.capacity  # [batch, n]

    rewards = buffer.data["reward"][rows, e_idx[:, None]]          # [batch, n]
    terminateds = buffer.data["terminated"][rows, e_idx[:, None]]  # [batch, n]
    truncateds = buffer.data["truncated"][rows, e_idx[:, None]]

    # mask[k] = 1 while no termination/truncation happened strictly before k
    dones = jnp.clip(terminateds + truncateds, 0.0, 1.0)
    alive = jnp.cumprod(1.0 - dones, axis=1)
    mask = jnp.concatenate([jnp.ones_like(alive[:, :1]), alive[:, :-1]], axis=1)

    discounts = gamma ** jnp.arange(n_step)[None, :]
    n_step_reward = (rewards * discounts * mask).sum(axis=1)

    # last live index per sequence
    last = jnp.maximum((mask > 0).sum(axis=1) - 1, 0)  # [batch]
    last_rows = rows[jnp.arange(batch_size), last]
    n_step_next = buffer.data["next_observation"][last_rows, e_idx]
    n_step_terminated = buffer.data["terminated"][last_rows, e_idx]
    n_step_gamma = gamma ** (last.astype(jnp.float32) + 1.0)

    first_rows = rows[:, 0]
    return {
        "observation": buffer.data["observation"][first_rows, e_idx],
        "action": buffer.data["action"][first_rows, e_idx],
        "n_step_reward": n_step_reward,
        "n_step_next_observation": n_step_next,
        "n_step_terminated": n_step_terminated,
        "n_step_gamma": n_step_gamma,
    }
