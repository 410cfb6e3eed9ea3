"""Architecture building blocks for the scaled-network algorithm families.

- Pre-LN residual MLP blocks (SimBa, `rl_x/algorithms/simba/flax/layers.py:6-43`)
- BroNet residual trunks (BRO, `rl_x/algorithms/bro/flax/layers.py`)
- Hypersphere-normalized layers (SimbaV2, `rl_x/algorithms/simbav2/flax/layers.py:16-114`)
- BatchRenorm (CrossQ, `rl_x/algorithms/crossq/flax/batch_renorm.py`)
"""

from typing import Sequence

import jax
import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import constant, orthogonal


class PreLNResidualBlock(nn.Module):
    """LayerNorm -> Dense(4h) -> relu -> Dense(h) + residual."""

    hidden_dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.hidden_dim * self.expansion, kernel_init=nn.initializers.he_normal())(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.he_normal())(x)
        return residual + x


class SimbaEncoder(nn.Module):
    hidden_dim: int
    nr_blocks: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, kernel_init=orthogonal(1.0))(x)
        for _ in range(self.nr_blocks):
            x = PreLNResidualBlock(self.hidden_dim)(x)
        return nn.LayerNorm()(x)


class BroNetBlock(nn.Module):
    """Dense -> LN -> relu -> Dense -> LN + residual (BRO trunk)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        return residual + x


class BroNetEncoder(nn.Module):
    hidden_dim: int
    nr_blocks: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        for _ in range(self.nr_blocks):
            x = BroNetBlock(self.hidden_dim)(x)
        return x


def l2_normalize(x, axis=-1, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


class Scaler(nn.Module):
    """Learnable per-feature scale (SimbaV2)."""

    dim: int
    init: float = 1.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        scaler = self.param("scaler", constant(self.scale), (self.dim,))
        return x * scaler * (self.init / self.scale)


class HyperDense(nn.Module):
    """Dense layer with unit-norm columns (weights live on the hypersphere).

    The reference keeps plain kernels and re-projects them after every
    optimizer step (`simbav2/flax/layers.py:131-144` l2normalize_params);
    normalizing inside the forward pass is the implicit equivalent (the
    gradient flows through the normalization, same constraint set).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.orthogonal(column_axis=0), (x.shape[-1], self.features)
        )
        kernel = l2_normalize(kernel, axis=0)
        return x @ kernel


class HyperEmbedder(nn.Module):
    """Input -> hypersphere with a constant shift channel
    (`simbav2/flax/layers.py:40-55`): appending c_shift before normalizing
    keeps the input MAGNITUDE recoverable from the direction — without it
    the first projection throws away ||x|| entirely (e.g. Pendulum's
    angular velocity after obs normalization)."""

    hidden_dim: int
    c_shift: float = 3.0

    @nn.compact
    def __call__(self, x):
        shift = jnp.ones(x.shape[:-1] + (1,)) * self.c_shift
        x = jnp.concatenate([x, shift], axis=-1)
        x = l2_normalize(x)
        x = HyperDense(self.hidden_dim)(x)
        s = float(np.sqrt(2.0 / self.hidden_dim))
        x = Scaler(self.hidden_dim, init=s, scale=s)(x)
        return l2_normalize(x)


class HyperLERPBlock(nn.Module):
    """SimbaV2 residual block (`layers.py:57-94`): hypersphere MLP
    (relu + eps, output re-normalized) merged by a learnable-scaler lerp,
    result re-projected to the sphere."""

    hidden_dim: int
    nr_blocks: int = 1  # alpha_init = 1 / (nr_blocks + 1)
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        s = float(np.sqrt(2.0 / self.hidden_dim) / np.sqrt(self.expansion))
        h = HyperDense(self.hidden_dim * self.expansion)(x)
        h = Scaler(self.hidden_dim * self.expansion, init=s, scale=s)(h)
        h = nn.relu(h) + 1e-8
        h = HyperDense(self.hidden_dim)(h)
        h = l2_normalize(h)
        alpha = Scaler(
            self.hidden_dim,
            init=1.0 / (self.nr_blocks + 1),
            scale=1.0 / float(np.sqrt(self.hidden_dim)),
        )(h - residual)
        return l2_normalize(residual + alpha)


class HyperHead(nn.Module):
    """Hypersphere output head (`layers.py:96-129`): HyperDense -> Scaler ->
    HyperDense + bias."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = HyperDense(self.hidden_dim)(x)
        h = Scaler(self.hidden_dim, init=1.0, scale=1.0)(h)
        out = HyperDense(self.out_dim)(h)
        return out + self.param("bias", nn.initializers.zeros, (self.out_dim,))


class SimbaV2Encoder(nn.Module):
    hidden_dim: int
    nr_blocks: int
    c_shift: float = 3.0

    @nn.compact
    def __call__(self, x):
        x = HyperEmbedder(self.hidden_dim, self.c_shift)(x)
        for _ in range(self.nr_blocks):
            x = HyperLERPBlock(self.hidden_dim, nr_blocks=self.nr_blocks)(x)
        return x


class BatchRenorm(nn.Module):
    """Batch renormalization (CrossQ's stabilizer for target-free training).

    Standard BN statistics with renorm correction factors r (clipped ratio of
    batch/running std) and d (clipped standardized mean shift); running stats
    live in the 'batch_stats' collection like nn.BatchNorm.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    r_max: float = 3.0
    d_max: float = 5.0
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, use_running_average=None):
        use_running_average = (
            self.use_running_average if use_running_average is None else use_running_average
        )
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features))
        steps = self.variable("batch_stats", "steps", lambda: jnp.zeros((), jnp.int32))
        gamma = self.param("scale", constant(1.0), (features,))
        beta = self.param("bias", constant(0.0), (features,))

        if use_running_average:
            x_hat = (x - ra_mean.value) / jnp.sqrt(ra_var.value + self.epsilon)
        else:
            batch_mean = x.mean(axis=tuple(range(x.ndim - 1)))
            batch_var = x.var(axis=tuple(range(x.ndim - 1)))
            batch_std = jnp.sqrt(batch_var + self.epsilon)
            running_std = jnp.sqrt(ra_var.value + self.epsilon)

            # warmup: plain BN until running stats are meaningful
            warmed_up = (steps.value > 1000).astype(jnp.float32)
            r = jnp.clip(batch_std / running_std, 1.0 / self.r_max, self.r_max)
            d = jnp.clip((batch_mean - ra_mean.value) / running_std, -self.d_max, self.d_max)
            r = jax.lax.stop_gradient(warmed_up * r + (1.0 - warmed_up) * jnp.ones_like(r))
            d = jax.lax.stop_gradient(warmed_up * d + (1.0 - warmed_up) * jnp.zeros_like(d))

            x_hat = ((x - batch_mean) / batch_std) * r + d
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * batch_mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * batch_var
            steps.value = steps.value + 1
        return gamma * x_hat + beta
