"""On-device circular replay buffer, packed for single-gather sampling.

Capability parity with the reference's in-jit buffer
(`rl_x/algorithms/sac/flax_full_jit/sac.py:139-154` alloc, `:199-205` write,
`:281-287` uniform sample), generalized, shared, and laid out for TPU:

- flat-field buffers (the continuous-control families) store ALL fields in
  ONE ``[nr_envs, capacity, D]`` float32 array.  A uniform sample is then a
  single row gather instead of one gather per field — six per-field gathers
  (four of them 4-byte scalar-row random accesses) cost 1.17 of the 2.11 ms
  SAC iteration on a v5e chip (benchmarks/profile_sac.py); packing collapses
  them into one ~300-byte-row gather.  The env axis is MAJOR: with
  [capacity, nr_envs, D] the in-loop write (dynamic-update-slice on the
  capacity axis) and the sample gather disagree on the preferred XLA layout
  and the compiler inserts two full-buffer transposing copies per iteration
  (~2.6 ms/iteration measured in the fused SAC loop); env-major makes both
  sides pick {2,1,0} and the copies vanish.
- buffers with wide fields (image observations) fall back to a
  dict-of-arrays layout with per-field gathers (``layout is None``).
- the ``nr_envs`` axis is the mesh "dp" axis, so the buffer lives sharded in
  HBM across the pod and writes are purely local (each device stores its own
  envs' slice).
- ``sample`` supports two modes:
  * ``shard_local=True`` (TPU default): time indices are drawn globally but
    env indices are drawn *within* each device's shard, so the gather never
    crosses devices — no ICI traffic on the hot path.
  * ``shard_local=False``: the reference's exact uniform (time, env) sampling.
- n-step sampling with write-head truncation patching
  (`rl_x/algorithms/fasttd3/flax_full_jit/fasttd3.py:380-392`) is provided
  for the FastTD3-family recipes; in packed mode the whole n-step sequence
  read is ONE ``[batch, n]``-row gather.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# layout entry: (name, offset, width, trailing_shape, dtype_name)
LayoutT = Optional[Tuple[Tuple[str, int, int, Tuple[int, ...], str], ...]]

_PACKABLE_DTYPES = (np.dtype(np.float32), np.dtype(np.int32), np.dtype(np.bool_))


@struct.dataclass
class ReplayBuffer:
    storage: Any                # packed [nr_envs, capacity, D] array OR dict name -> [capacity, nr_envs, ...]
    pos: jax.Array              # int32 write head
    size: jax.Array             # int32 filled rows
    layout: LayoutT = struct.field(pytree_node=False, default=None)

    @property
    def packed(self):
        return self.layout is not None

    @property
    def capacity(self):
        if self.packed:
            return self.storage.shape[1]
        return next(iter(self.storage.values())).shape[0]

    @property
    def nr_envs(self):
        if self.packed:
            return self.storage.shape[0]
        return next(iter(self.storage.values())).shape[1]

    @property
    def data(self):
        """Per-field view ``[capacity, nr_envs, ...]`` (unpacks packed mode)."""
        if not self.packed:
            return self.storage
        out = {}
        for name, off, width, shape, dtype in self.layout:
            field = jnp.swapaxes(self.storage[..., off:off + width], 0, 1)
            field = field.reshape(field.shape[:2] + tuple(shape)).astype(dtype)
            out[name] = field
        return out


def _build_layout(field_specs):
    """Pack layout if every field is flat (rank <= 1) and 4-byte numeric.

    int32 fields round-trip through float32 storage, which is exact only
    for magnitudes < 2**24 — fine for the action/done-style fields the
    algorithms store, fatal for large counters.  ``create`` enforces the
    contract at write time (see the |value| < 2**24 assert in ``add``'s
    packing path); fields that can exceed it must use an unpacked buffer
    (give the field a trailing shape of rank > 1 or a 64-bit dtype).
    """
    layout = []
    offset = 0
    for name, (shape, dtype) in field_specs.items():
        if len(shape) > 1 or np.dtype(dtype) not in _PACKABLE_DTYPES:
            return None
        width = int(shape[0]) if shape else 1
        layout.append((name, offset, width, tuple(int(s) for s in shape), np.dtype(dtype).name))
        offset += width
    return tuple(layout)


def create(capacity, nr_envs, field_specs):
    """``field_specs``: dict name -> (trailing_shape, dtype)."""
    layout = _build_layout(field_specs)
    if layout is not None:
        total = sum(width for _, _, width, _, _ in layout)
        storage = jnp.zeros((nr_envs, capacity, total), jnp.float32)
    else:
        storage = {
            name: jnp.zeros((capacity, nr_envs) + tuple(shape), dtype)
            for name, (shape, dtype) in field_specs.items()
        }
    return ReplayBuffer(
        storage=storage, pos=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32),
        layout=layout,
    )


def set_data(buffer, data):
    """Replace the full per-field contents (tests/tools; not a hot path)."""
    if not buffer.packed:
        return buffer.replace(storage=dict(data))
    rows = [
        jnp.swapaxes(
            data[name].astype(jnp.float32).reshape(buffer.capacity, buffer.nr_envs, width),
            0, 1,
        )
        for name, _, width, _, _ in buffer.layout
    ]
    return buffer.replace(storage=jnp.concatenate(rows, axis=-1))


def _pack_row(layout, transition, nr_envs):
    cols = []
    for name, _, width, _, _ in layout:
        value = transition[name]
        # int32 values above 2**24 would silently lose precision through the
        # float32 storage (contract documented in _build_layout)
        cols.append(value.astype(jnp.float32).reshape(nr_envs, width))
    return jnp.concatenate(cols, axis=-1)


def _unpack_rows(layout, rows, batch_shape):
    """rows: [..., D] -> dict of [..., field_shape] arrays."""
    out = {}
    for name, off, width, shape, dtype in layout:
        field = rows[..., off:off + width]
        field = field.reshape(batch_shape + tuple(shape)).astype(dtype)
        out[name] = field
    return out


def add(buffer, transition):
    """Write one ``[nr_envs, ...]`` row per field at the write head."""
    if buffer.packed:
        row = _pack_row(buffer.layout, transition, buffer.nr_envs)
        storage = jax.lax.dynamic_update_slice(
            buffer.storage, row[:, None, :], (0, buffer.pos, 0)
        )
    else:
        storage = {
            name: buffer.storage[name].at[buffer.pos].set(value)
            for name, value in transition.items()
        }
    return buffer.replace(
        storage=storage,
        pos=(buffer.pos + 1) % buffer.capacity,
        size=jnp.minimum(buffer.size + 1, buffer.capacity),
    )


def _sample_env_indices(buffer, env_key, batch_size, shard_local, dp_size):
    if shard_local and dp_size > 1:
        envs_per_shard = buffer.nr_envs // dp_size
        shard = jnp.arange(batch_size) % dp_size
        local = jax.random.randint(env_key, (batch_size,), 0, envs_per_shard)
        return shard * envs_per_shard + local
    return jax.random.randint(env_key, (batch_size,), 0, buffer.nr_envs)


def sample(buffer, key, batch_size, shard_local=True, dp_size=1):
    """Uniform sample of ``batch_size`` transitions -> dict of ``[batch, ...]``.

    With ``shard_local`` and ``dp_size > 1``, env indices are stratified so
    index ``i`` of the batch reads from env shard ``i % dp_size`` — combined
    with a batch sharded over dp this keeps every gather device-local.
    """
    time_key, env_key = jax.random.split(key)
    t_idx = jax.random.randint(time_key, (batch_size,), 0, buffer.size)
    e_idx = _sample_env_indices(buffer, env_key, batch_size, shard_local, dp_size)
    if buffer.packed:
        rows = buffer.storage[e_idx, t_idx]                 # ONE [batch, D] gather
        return _unpack_rows(buffer.layout, rows, (batch_size,))
    return {name: arr[t_idx, e_idx] for name, arr in buffer.storage.items()}


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
    e_idx = _sample_env_indices(buffer, env_key, batch_size, shard_local, dp_size)

    # When the buffer is full the circular write head means "row pos-1" is the
    # newest; re-base indices so consecutive t0+k never wraps over the head.
    full = buffer.size >= buffer.capacity
    base = jnp.where(full, buffer.pos, 0)
    rows = (base + t0[:, None] + jnp.arange(n_step)[None, :]) % buffer.capacity  # [batch, n]

    if buffer.packed:
        seq_rows = buffer.storage[e_idx[:, None], rows]       # ONE [batch, n, D] gather
        seq = _unpack_rows(buffer.layout, seq_rows, (batch_size, n_step))
        rewards, terminateds, truncateds = seq["reward"], seq["terminated"], seq["truncated"]
    else:
        rewards = buffer.storage["reward"][rows, e_idx[:, None]]          # [batch, n]
        terminateds = buffer.storage["terminated"][rows, e_idx[:, None]]  # [batch, n]
        truncateds = buffer.storage["truncated"][rows, e_idx[:, None]]

    # mask[k] = 1 while no termination/truncation happened strictly before k
    dones = jnp.clip(terminateds + truncateds, 0.0, 1.0)
    alive = jnp.cumprod(1.0 - dones, axis=1)
    mask = jnp.concatenate([jnp.ones_like(alive[:, :1]), alive[:, :-1]], axis=1)

    discounts = gamma ** jnp.arange(n_step)[None, :]
    n_step_reward = (rewards * discounts * mask).sum(axis=1)

    # last live index per sequence
    last = jnp.maximum((mask > 0).sum(axis=1) - 1, 0)  # [batch]
    if buffer.packed:
        take_last = lambda x: jnp.take_along_axis(
            x, last.reshape((batch_size,) + (1,) * (x.ndim - 1)), axis=1
        ).squeeze(1)
        n_step_next = take_last(seq["next_observation"])
        n_step_terminated = take_last(seq["terminated"])
        observation = seq["observation"][:, 0]
        action = seq["action"][:, 0]
    else:
        last_rows = rows[jnp.arange(batch_size), last]
        n_step_next = buffer.storage["next_observation"][last_rows, e_idx]
        n_step_terminated = buffer.storage["terminated"][last_rows, e_idx]
        first_rows = rows[:, 0]
        observation = buffer.storage["observation"][first_rows, e_idx]
        action = buffer.storage["action"][first_rows, e_idx]
    n_step_gamma = gamma ** (last.astype(jnp.float32) + 1.0)

    return {
        "observation": observation,
        "action": action,
        "n_step_reward": n_step_reward,
        "n_step_next_observation": n_step_next,
        "n_step_terminated": n_step_terminated,
        "n_step_gamma": n_step_gamma,
    }
