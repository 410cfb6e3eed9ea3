"""Minimal jittable spaces for device-resident environments.

The reference ships a per-env-duplicated ``BoxSpace``
(`rl_x/environments/custom_mujoco/ant/mjx/box_space.py:4-22`); here it is a
single shared module, plus a ``DiscreteSpace`` for the DQN family.
Both expose jittable ``sample(key)`` and are understood by
``rlx_tpu.models`` policy/critic factories.
"""

import jax
import jax.numpy as jnp
import numpy as np


class BoxSpace:
    """Continuous box space.

    center / scale follow the reference's robot-locomotion convention:
    ``center`` is the nominal joint position (no impact on sampling),
    ``scale`` divides sampled actions.
    """

    def __init__(self, low, high, shape, dtype=jnp.float32, center=None, scale=None):
        self.low = jnp.asarray(low, dtype=dtype) if np.ndim(low) or np.isfinite(np.asarray(low)).all() else low
        self.high = jnp.asarray(high, dtype=dtype) if np.ndim(high) or np.isfinite(np.asarray(high)).all() else high
        self.shape = tuple(shape)
        self.dtype = dtype
        self.center = center if center is not None else jnp.zeros(shape, dtype=dtype)
        self.scale = scale if scale is not None else jnp.ones(shape, dtype=dtype)

    def sample(self, key, batch_shape=()):
        low = jnp.broadcast_to(jnp.asarray(self.low, self.dtype), self.shape)
        high = jnp.broadcast_to(jnp.asarray(self.high, self.dtype), self.shape)
        # Unbounded dims sample from N(0, 1) instead of U(low, high).
        finite = jnp.isfinite(low) & jnp.isfinite(high)
        u = jax.random.uniform(key, batch_shape + self.shape, dtype=self.dtype,
                               minval=jnp.where(finite, low, 0.0),
                               maxval=jnp.where(finite, high, 1.0))
        n = jax.random.normal(key, batch_shape + self.shape, dtype=self.dtype)
        return jnp.where(finite, u, n) / self.scale


class DiscreteSpace:
    """Discrete space with ``n`` actions; ``shape`` is () like Gymnasium."""

    def __init__(self, n, dtype=jnp.int32):
        self.n = int(n)
        self.shape = ()
        self.dtype = dtype

    def sample(self, key, batch_shape=()):
        return jax.random.randint(key, batch_shape, 0, self.n, dtype=self.dtype)
