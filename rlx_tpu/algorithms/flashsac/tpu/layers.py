"""FlashSAC layer zoo — exact parity with the reference's architecture
(`rl_x/algorithms/flashsac/flax/layers.py:8-127`), rewritten for this
codebase's conventions.

The unit-norm discipline: every linear kernel is bias-free and kept with
unit-norm input columns by an explicit post-update projection
(:func:`project_params`); norm-layer affine parameters are re-scaled to the
sqrt(dim) sphere.  The nets are BatchNorm-whitened residual MLP stacks with
an RMSNorm before the heads.

Blocks (reference lines in parentheses):

- ``UnitLinear`` (8-14): orthogonal-init, bias-free dense.
- ``FlashSACEmbedder`` (33-40): input BatchNorm -> UnitLinear.
- ``FlashSACBlock`` (43-57): residual [UnitLinear(4h) -> BN -> relu ->
  UnitLinear(h) -> BN -> relu] + x.
- ``NormalTanhPolicy`` (60-76): separate mean/std kernels+biases with a
  tanh-bounded log-std in [log_std_min, log_std_max].
- ``CategoricalValueHead`` (79-93, "EnsembleCategoricalValue"): single
  linear to ``nr_atoms`` logits; value is the expectation over the uniform
  [v_min, v_max] bin grid.
- ``project_params`` (96-127): the post-update projection applied after
  every gradient step AND at init.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import constant, orthogonal


class UnitLinear(nn.Module):
    """Bias-free dense whose kernel the training loop keeps column-unit-norm."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", orthogonal(1.0), (x.shape[-1], self.features))
        return x @ kernel


class FlashSACEmbedder(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99)(x)
        return UnitLinear(self.hidden_dim)(x)


class FlashSACBlock(nn.Module):
    hidden_dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        x = UnitLinear(self.hidden_dim * self.expansion)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99)(x)
        x = nn.relu(x)
        x = UnitLinear(self.hidden_dim)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99)(x)
        x = nn.relu(x)
        return x + residual


class NormalTanhPolicy(nn.Module):
    action_dim: int
    log_std_min: float = -10.0
    log_std_max: float = 2.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        mean_kernel = self.param("mean_kernel", orthogonal(1.0), (in_dim, self.action_dim))
        mean_bias = self.param("mean_bias", constant(0.0), (self.action_dim,))
        std_kernel = self.param("std_kernel", orthogonal(1.0), (in_dim, self.action_dim))
        std_bias = self.param("std_bias", constant(0.0), (self.action_dim,))
        mean = x @ mean_kernel + mean_bias
        raw = x @ std_kernel + std_bias
        log_std = self.log_std_min + (self.log_std_max - self.log_std_min) * 0.5 * (
            1.0 + jnp.tanh(raw)
        )
        return mean, jnp.exp(log_std)


class CategoricalValueHead(nn.Module):
    """Linear -> log-softmax over atoms; returns (expected value, log-probs)."""

    nr_atoms: int
    v_min: float
    v_max: float

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", orthogonal(1.0), (x.shape[-1], self.nr_atoms))
        bias = self.param("bias", constant(0.0), (self.nr_atoms,))
        log_probs = jax.nn.log_softmax(x @ kernel + bias, axis=-1)
        bins = jnp.linspace(self.v_min, self.v_max, self.nr_atoms, dtype=jnp.float32)
        value = jnp.sum(jnp.exp(log_probs) * bins, axis=-1)
        return value, log_probs


class FlashSACTrunk(nn.Module):
    """Embedder -> nr_blocks residual blocks -> RMSNorm (shared by policy
    and critic bodies; `flashsac/flax/{policy,critic}.py`)."""

    hidden_dim: int
    nr_blocks: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = FlashSACEmbedder(self.hidden_dim)(x, train)
        for _ in range(self.nr_blocks):
            x = FlashSACBlock(self.hidden_dim)(x, train)
        return nn.RMSNorm(epsilon=1e-6)(x)


class FlashSACPolicy(nn.Module):
    action_dim: int
    hidden_dim: int
    nr_blocks: int
    log_std_min: float = -10.0
    log_std_max: float = 2.0
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        x = FlashSACTrunk(self.hidden_dim, self.nr_blocks)(x, train)
        return NormalTanhPolicy(self.action_dim, self.log_std_min, self.log_std_max)(x)


class FlashSACCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_atoms: int
    v_min: float
    v_max: float
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action, train: bool):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        x = FlashSACTrunk(self.hidden_dim, self.nr_blocks)(x, train)
        return CategoricalValueHead(self.nr_atoms, self.v_min, self.v_max)(x)


class FlashSACDoubleCritic(nn.Module):
    """Twin categorical critics with independent params AND batch stats."""

    hidden_dim: int
    nr_blocks: int
    nr_atoms: int
    v_min: float
    v_max: float
    nr_critics: int = 2
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action, train: bool):
        ensemble = nn.vmap(
            FlashSACCritic,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            in_axes=(None, None, None),
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(
            self.hidden_dim, self.nr_blocks, self.nr_atoms,
            self.v_min, self.v_max, self.observation_indices,
        )(obs, action, train)


def project_params(params):
    """Post-update parameter projection (`flashsac/flax/layers.py:96-127`).

    - linear kernels (incl. policy mean/std kernels): each input-column
      normalized to unit L2 norm (axis -2);
    - RMSNorm ``scale``: rescaled so ||scale|| = sqrt(dim);
    - BatchNorm affine: (scale, bias) JOINTLY rescaled so the concatenated
      vector has norm sqrt(dim); running stats untouched (they live in the
      ``batch_stats`` collection, not here);
    - biases (mean_bias/std_bias/atom bias) untouched.
    """

    def leaf_rule(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        name = names[-1] if names else ""
        in_norm_layer = any("BatchNorm" in n or "RMSNorm" in n for n in names)
        if in_norm_layer:
            if name == "scale" and any("RMSNorm" in n for n in names):
                d = leaf.shape[-1]
                sq = jnp.sum(leaf * leaf, axis=-1, keepdims=True)
                return leaf * (math.sqrt(d) * jax.lax.rsqrt(sq + 1e-8))
            return leaf  # BatchNorm handled pairwise below
        if name.endswith("kernel"):
            norm = jnp.linalg.norm(leaf, axis=-2, keepdims=True)
            return leaf / jnp.where(norm < 1e-8, 1.0, norm)
        return leaf

    params = jax.tree_util.tree_map_with_path(leaf_rule, params)

    def bn_pair_rule(tree, parent=""):
        if not isinstance(tree, dict):
            return tree
        if (
            "BatchNorm" in parent
            and "scale" in tree
            and "bias" in tree
            and isinstance(tree["scale"], jnp.ndarray)
        ):
            scale, bias = tree["scale"], tree["bias"]
            d = scale.shape[-1]
            sq = jnp.sum(scale * scale + bias * bias, axis=-1, keepdims=True)
            factor = math.sqrt(d) * jax.lax.rsqrt(sq + 1e-8)
            return {**tree, "scale": scale * factor, "bias": bias * factor}
        return {k: bn_pair_rule(v, parent=k) for k, v in tree.items()}

    return bn_pair_rule(params)
