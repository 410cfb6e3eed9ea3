"""Differentiable trust-region projections for diagonal Gaussian policies.

Capability parity with `rl_x/algorithms/ppo_dtrl/flax/trust_region_layer.py`
(Otto et al., Differentiable Trust Region Layers, arXiv:2101.09207):

- mean projection: closed-form Mahalanobis rescaling toward the old mean
  when the mean part of the KL exceeds ``mean_bound``;
- covariance KL projection: precision interpolation
  lambda_p = (eta lambda_0 + lambda) / (eta + 1) with the dual variable eta
  solved per sample.  The reference runs an in-jit BFGS with a hand-derived
  custom backward (`trust_region_layer.py:27-135`); here eta is found by
  unrolled damped Newton iterations in log-space with gradients flowing
  through the converged iterates (implicit-function gradient emerges from
  the unrolled fixed point) — fewer moving parts, same projection;
- entropy projection: uniform log-std shift enforcing a minimum entropy.

All ops are batched [B, A] and differentiable.
"""

import jax
import jax.numpy as jnp

LOG_2PI_E = jnp.log(2.0 * jnp.pi * jnp.e)


def gaussian_kl_parts(mean, std, old_mean, old_std):
    """Diagonal-Gaussian KL(old || new) split into mean and cov parts."""
    mean_part = 0.5 * (((mean - old_mean) / old_std) ** 2).sum(-1)
    cov_part = 0.5 * (
        2.0 * (jnp.log(std) - jnp.log(old_std)) + (old_std / std) ** 2 - 1.0
    ).sum(-1)
    return mean_part, cov_part


def mean_projection(mean, old_mean, old_std, mean_bound):
    """Scale the mean difference back onto the Mahalanobis ball."""
    maha = (((mean - old_mean) / old_std) ** 2).sum(-1)
    scale = jnp.sqrt(mean_bound / jnp.maximum(maha, 1e-12))
    needs = maha > 2.0 * mean_bound  # kl mean part = maha/2
    proj = old_mean + (mean - old_mean) * jnp.minimum(scale * jnp.sqrt(2.0), 1.0)[..., None]
    return jnp.where(needs[..., None], proj, mean), maha


def _cov_kl_of_eta(log_eta, std, old_std, cov_bound):
    """cov-KL(old || projected(eta)) - bound for one sample."""
    eta = jnp.exp(log_eta)
    prec_p = (eta / old_std**2 + 1.0 / std**2) / (eta + 1.0)
    var_p = 1.0 / prec_p
    cov_kl = 0.5 * (
        jnp.log(var_p / old_std**2) + old_std**2 / var_p - 1.0
    ).sum()
    return cov_kl - cov_bound


def cov_projection(std, old_std, cov_bound, nr_newton_steps=15):
    """Project stds so the cov part of KL(old || new) <= cov_bound.

    Returns (projected_std [B, A], eta [B]).
    """

    def solve_one(std_i, old_std_i):
        g = lambda log_eta: _cov_kl_of_eta(log_eta, std_i, old_std_i, cov_bound)
        g_grad = jax.grad(g)

        def newton(log_eta, _):
            val = g(log_eta)
            grad = g_grad(log_eta)
            step = val / jnp.where(jnp.abs(grad) > 1e-10, grad, jnp.sign(grad) * 1e-10 + 1e-12)
            # damped step, clipped to keep the iteration stable
            log_eta = log_eta - jnp.clip(step, -2.0, 2.0)
            return jnp.clip(log_eta, -10.0, 12.0), None

        log_eta, _ = jax.lax.scan(newton, jnp.asarray(0.0), None, nr_newton_steps)
        eta = jnp.exp(log_eta)
        prec_p = (eta / old_std_i**2 + 1.0 / std_i**2) / (eta + 1.0)
        return jnp.sqrt(1.0 / prec_p), eta

    proj_std, eta = jax.vmap(solve_one)(std, old_std)
    _, cov_part = gaussian_kl_parts(jnp.zeros_like(std), std, jnp.zeros_like(std), old_std)
    needs = cov_part > cov_bound
    proj_std = jnp.where(needs[..., None], proj_std, std)
    eta = jnp.where(needs, eta, 0.0)
    return proj_std, eta


def kl_projection(mean, std, old_mean, old_std, mean_bound, cov_bound):
    """Full per-sample trust-region projection; returns projected stats and
    diagnostics (pre/post KL parts, dual values)."""
    kl_mean_part, kl_cov_part = gaussian_kl_parts(mean, std, old_mean, old_std)
    proj_mean, maha = mean_projection(mean, old_mean, old_std, mean_bound)
    proj_std, eta_cov = cov_projection(std, old_std, cov_bound)
    post_mean_part, post_cov_part = gaussian_kl_parts(proj_mean, proj_std, old_mean, old_std)
    return {
        "mean": proj_mean,
        "std": proj_std,
        "eta_cov": eta_cov,
        "kl_mean_part": kl_mean_part,
        "kl_cov_part": kl_cov_part,
        "post_kl_mean_part": post_mean_part,
        "post_kl_cov_part": post_cov_part,
    }


def entropy_projection(log_std, min_entropy):
    """Uniformly shift log-stds up if entropy drops below ``min_entropy``."""
    dim = log_std.shape[-1]
    entropy = 0.5 * dim * LOG_2PI_E + log_std.sum(-1)
    shift = jnp.maximum(min_entropy - entropy, 0.0) / dim
    return log_std + shift[..., None]
