"""Shared Flax network building blocks.

Init schemes follow the reference exactly for curve parity: orthogonal
kernels with sqrt(2) gain on trunks, small-gain output heads, constant-zero
biases (`rl_x/algorithms/ppo/flax/policy.py:34-39`,
`rl_x/algorithms/ppo/flax_full_jit/policy.py:33-42`).

TPU notes: hidden widths default to multiples of 128 so Dense matmuls tile
cleanly onto the 128x128 MXU; activations are computed in the param dtype
(bfloat16-friendly via the runner's default matmul precision).
"""

from typing import Any, Callable, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import constant, orthogonal


ACTIVATIONS = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "swish": nn.swish,
    "silu": nn.silu,
}


class MLP(nn.Module):
    """Plain trunk: Dense -> (optional LayerNorm on first layer) -> activation.

    ``orthogonal_init=False`` keeps flax's default (lecun) init — the
    reference's off-policy nets use it (`sac/flax_full_jit/policy.py:31-38`).

    ``dtype`` is the COMPUTE dtype (params stay float32): bfloat16 halves the
    HBM traffic of the activation tensors, the dominant memory cost of the
    update phase at RL batch sizes (measured ~8 ms/iteration on the flagship
    bench, benchmarks/profile_update.py).  Gradients w.r.t. the float32
    params come back float32 (the cast's backward is a cast), so Adam and the
    optimizer state are unaffected.
    """

    hidden_sizes: Sequence[int]
    activation: str = "tanh"
    layer_norm: bool = False        # LayerNorm after the first Dense (reference locomotion nets)
    kernel_gain: float = float(np.sqrt(2))
    orthogonal_init: bool = True
    layer_norm_all: bool = False    # LayerNorm after every Dense (PQN/CrossQ-style)
    dtype: Any = None               # compute dtype; None = float32

    @nn.compact
    def __call__(self, x):
        act = ACTIVATIONS[self.activation]
        for i, size in enumerate(self.hidden_sizes):
            if self.orthogonal_init:
                x = nn.Dense(size, kernel_init=orthogonal(self.kernel_gain), bias_init=constant(0.0),
                             dtype=self.dtype)(x)
            else:
                x = nn.Dense(size, dtype=self.dtype)(x)
            if self.layer_norm_all or (self.layer_norm and i == 0):
                x = nn.LayerNorm(dtype=self.dtype)(x)
            x = act(x)
        return x


class SquashedGaussianPolicy(nn.Module):
    """SAC-style policy: trunk -> (mean, clamped state-dependent logstd).

    Mirrors `rl_x/algorithms/sac/flax_full_jit/policy.py:22-43` capability;
    sampling/tanh-squash/logprob live in rlx_tpu.models.distributions.
    """

    action_dim: int
    hidden_sizes: Sequence[int]
    activation: str = "elu"
    layer_norm: bool = True
    log_std_min: float = -20.0
    log_std_max: float = 2.0
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, x):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        x = MLP(self.hidden_sizes, self.activation, self.layer_norm, orthogonal_init=False)(x)
        mean = nn.Dense(self.action_dim)(x)
        log_std = nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, log_std


class DiscreteQNet(nn.Module):
    """obs -> Q-values per action.  Flat obs use an MLP trunk; image obs
    (ndim >= 3) the Nature CNN (`rl_x/algorithms/dqn/flax/critic.py:20-33`).
    ``output_dim_per_action`` > 1 yields distributional heads
    ([..., nr_actions, output_dim_per_action], e.g. C51 atoms).
    """

    nr_actions: int
    hidden_sizes: Sequence[int]
    activation: str = "relu"
    output_dim_per_action: int = 1
    layer_norm_all: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim >= 4:  # [..., H, W, C] images
            x = NatureCNN()(x)
        else:
            x = MLP(self.hidden_sizes, self.activation, orthogonal_init=False,
                    layer_norm_all=self.layer_norm_all)(x)
        out = nn.Dense(self.nr_actions * self.output_dim_per_action)(x)
        if self.output_dim_per_action > 1:
            return out.reshape(out.shape[:-1] + (self.nr_actions, self.output_dim_per_action))
        return out


class DeterministicTanhPolicy(nn.Module):
    """DDPG/TD3 policy: trunk -> tanh(Dense) in [-1, 1]."""

    action_dim: int
    hidden_sizes: Sequence[int]
    activation: str = "relu"
    layer_norm: bool = False
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, x):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        x = MLP(self.hidden_sizes, self.activation, self.layer_norm, orthogonal_init=False)(x)
        return jnp.tanh(nn.Dense(self.action_dim)(x))


class EntropyCoefficient(nn.Module):
    """Learnable alpha via log-param (`sac/flax_full_jit/entropy_coefficient.py:5-11`)."""

    init_ent_coef: float = 1.0

    @nn.compact
    def __call__(self):
        log_alpha = self.param("log_alpha", lambda key: jnp.full((), jnp.log(self.init_ent_coef)))
        return jnp.exp(log_alpha)


class NatureCNN(nn.Module):
    """DQN Nature CNN for [..., H, W, C] image observations.

    Mirrors `rl_x/algorithms/dqn/flax/critic.py:20-33` capability (IMAGES
    observation support) with NHWC layout, which XLA maps onto the MXU via
    implicit im2col.
    """

    features: int = 512

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID")(x))
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.features)(x))
        return x


class GaussianPolicy(nn.Module):
    """MLP policy emitting (mean, logstd) with a state-independent logstd
    parameter, matching `rl_x/algorithms/ppo/flax_full_jit/policy.py:30-43`.
    """

    action_dim: int
    hidden_sizes: Sequence[int]
    activation: str = "tanh"
    layer_norm: bool = False
    std_dev: float = 1.0
    observation_indices: Sequence[int] = None
    vision: bool = False  # NatureCNN encoder for IMAGES observations
    dtype: Any = None     # trunk compute dtype; head + distribution stay f32

    @nn.compact
    def __call__(self, x):
        if self.vision:
            x = NatureCNN()(x)
        else:
            if self.observation_indices is not None:
                x = x[..., jnp.asarray(self.observation_indices)]
            x = MLP(self.hidden_sizes, self.activation, self.layer_norm, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        mean = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01), bias_init=constant(0.0))(x)
        logstd = self.param("policy_logstd", constant(float(np.log(self.std_dev))), (1, self.action_dim))
        return mean, logstd


class CategoricalPolicy(nn.Module):
    """MLP policy over discrete actions (logits head)."""

    nr_actions: int
    hidden_sizes: Sequence[int]
    activation: str = "tanh"
    layer_norm: bool = False
    observation_indices: Sequence[int] = None
    vision: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.vision:
            x = NatureCNN()(x)
        else:
            if self.observation_indices is not None:
                x = x[..., jnp.asarray(self.observation_indices)]
            x = MLP(self.hidden_sizes, self.activation, self.layer_norm, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return nn.Dense(self.nr_actions, kernel_init=orthogonal(0.01), bias_init=constant(0.0))(x)


class VCritic(nn.Module):
    """State-value critic, matching `rl_x/algorithms/ppo/flax_full_jit/critic.py:19-34`."""

    hidden_sizes: Sequence[int]
    activation: str = "tanh"
    layer_norm: bool = False
    observation_indices: Sequence[int] = None
    vision: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.vision:
            x = NatureCNN()(x)
        else:
            if self.observation_indices is not None:
                x = x[..., jnp.asarray(self.observation_indices)]
            x = MLP(self.hidden_sizes, self.activation, self.layer_norm, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return nn.Dense(1, kernel_init=orthogonal(1.0), bias_init=constant(0.0))(x)


class QCritic(nn.Module):
    """(s, a) -> Q MLP critic (SAC/TD3/DDPG family)."""

    hidden_sizes: Sequence[int]
    activation: str = "relu"
    layer_norm: bool = False
    output_dim: int = 1
    orthogonal_init: bool = False
    observation_indices: Sequence[int] = None
    dropout_rate: float = 0.0  # DroQ-style Dense -> Dropout -> LayerNorm -> act
    layer_norm_all: bool = False

    @nn.compact
    def __call__(self, obs, action):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        if self.dropout_rate > 0.0:
            act = ACTIVATIONS[self.activation]
            for size in self.hidden_sizes:
                x = nn.Dense(size)(x)
                x = nn.Dropout(rate=self.dropout_rate, deterministic=False)(x)
                x = nn.LayerNorm()(x)
                x = act(x)
        else:
            x = MLP(self.hidden_sizes, self.activation, self.layer_norm,
                    orthogonal_init=self.orthogonal_init,
                    layer_norm_all=self.layer_norm_all)(x)
        if self.orthogonal_init:
            return nn.Dense(self.output_dim, kernel_init=orthogonal(1.0), bias_init=constant(0.0))(x)
        return nn.Dense(self.output_dim)(x)


class VectorQCritic(nn.Module):
    """Ensemble of Q critics via nn.vmap over the params axis, matching the
    reference twin/ensemble idiom (`rl_x/algorithms/sac/flax/critic.py:34-55`).
    """

    hidden_sizes: Sequence[int]
    nr_critics: int = 2
    activation: str = "relu"
    layer_norm: bool = False
    output_dim: int = 1
    orthogonal_init: bool = False
    observation_indices: Sequence[int] = None
    dropout_rate: float = 0.0
    layer_norm_all: bool = False

    @nn.compact
    def __call__(self, obs, action):
        ensemble = nn.vmap(
            QCritic,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(
            self.hidden_sizes, self.activation, self.layer_norm, self.output_dim,
            self.orthogonal_init, self.observation_indices, self.dropout_rate,
            self.layer_norm_all,
        )(obs, action)


def get_processed_action_function(action_clipping_and_rescaling, low, high):
    """clip to [-1,1] then rescale to env bounds, selectable
    (`rl_x/algorithms/ppo/flax/policy.py:43-50`)."""
    if action_clipping_and_rescaling:
        low = jnp.asarray(low)
        high = jnp.asarray(high)

        def process(action):
            clipped = jnp.clip(action, -1.0, 1.0)
            return low + 0.5 * (clipped + 1.0) * (high - low)

        return process
    return lambda action: action
