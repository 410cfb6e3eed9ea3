"""Probability helpers used inside jitted training programs.

Implements the exact log-prob / entropy formulations of the reference so
learning curves match within seed variance:
- diagonal Gaussian (`rl_x/algorithms/ppo/flax_full_jit/ppo.py:135-138,181-196`)
- squashed (tanh) Gaussian for SAC (`rl_x/algorithms/sac/flax/policy.py`)
- categorical for discrete control
"""

import jax
import jax.numpy as jnp

LOG_2PI = jnp.log(2.0 * jnp.pi)


def gaussian_sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


def gaussian_log_prob(mean, logstd, action):
    """Sum over action dims; matches reference formulation exactly."""
    std = jnp.exp(logstd)
    lp = -0.5 * ((action - mean) / std) ** 2 - 0.5 * LOG_2PI - logstd
    return lp.sum(-1)


def gaussian_entropy(logstd):
    """Per-dim entropy summed over dims (state-independent logstd)."""
    return (logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum(-1)


def tanh_gaussian_sample_and_log_prob(key, mean, logstd):
    """Reparameterized tanh-Gaussian sample with change-of-variables logprob."""
    std = jnp.exp(logstd)
    gaussian = mean + std * jax.random.normal(key, mean.shape)
    action = jnp.tanh(gaussian)
    log_prob = (-0.5 * ((gaussian - mean) / std) ** 2 - 0.5 * LOG_2PI - logstd)
    # tanh correction, numerically-stable form: log(1 - tanh(x)^2) = 2*(log2 - x - softplus(-2x))
    log_prob -= 2.0 * (jnp.log(2.0) - gaussian - jax.nn.softplus(-2.0 * gaussian))
    return action, log_prob.sum(-1)


def tanh_gaussian_mode(mean):
    return jnp.tanh(mean)


def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits, action):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None], axis=-1).squeeze(-1)


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(jnp.exp(logp) * logp).sum(-1)
