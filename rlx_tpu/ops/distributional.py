"""Distributional value-learning ops shared across the framework.

- categorical (C51) projection of a shifted support onto a fixed atom grid
  (used by c51, and the FastTD3/FastSAC-family categorical critics,
  `rl_x/algorithms/fasttd3/flax_full_jit/fasttd3.py:287-339`);
- HL-Gauss targets: Gaussian-smeared histogram regression
  (`rl_x/algorithms/dqn_hl_gauss/flax/dqn_hl_gauss.py`, xqc/reppo critics).

All ops are batched, static-shaped, and differentiable where needed.
"""

import jax
import jax.numpy as jnp

from rlx_tpu.ops import _dispatch


def categorical_projection(target_z, probs, v_min, v_max, nr_atoms):
    """Project probability mass at positions ``target_z`` [..., A] with
    weights ``probs`` [..., A] onto the uniform atom grid -> [..., nr_atoms].

    Standard C51 projection: clip positions, distribute each mass linearly
    between its two neighboring atoms.
    """
    delta_z = (v_max - v_min) / (nr_atoms - 1)
    target_z = jnp.clip(target_z, v_min, v_max)
    b = (target_z - v_min) / delta_z                      # fractional atom index
    lower = jnp.floor(b)
    upper = jnp.ceil(b)
    # when b is integral, put all mass on the lower atom
    on_atom = (upper == lower).astype(probs.dtype)
    lower_weight = probs * (upper - b + on_atom)
    upper_weight = probs * (b - lower)

    atoms = jnp.arange(nr_atoms)

    def project_one(low_idx, up_idx, low_w, up_w):
        out = jnp.zeros(nr_atoms, dtype=probs.dtype)
        out = out.at[low_idx.astype(jnp.int32)].add(low_w)
        out = out.at[up_idx.astype(jnp.int32)].add(up_w)
        return out

    flat_shape = (-1,) + (target_z.shape[-1],)
    projected = jax.vmap(project_one)(
        lower.reshape(flat_shape),
        upper.reshape(flat_shape),
        lower_weight.reshape(flat_shape),
        upper_weight.reshape(flat_shape),
    )
    del atoms
    return projected.reshape(target_z.shape[:-1] + (nr_atoms,))


def categorical_projection_dense(target_z, probs, v_min, v_max, nr_atoms):
    """Scatter-free C51 projection (TPU default).

    The classic formulation scatter-adds each mass onto its two neighbor
    atoms — scatters serialize badly on TPU.  The same linear interpolation
    is a dense hat-kernel contraction:

        out[..., i] = sum_j clip(1 - |b_j - i|, 0, 1) * probs[..., j]

    with ``b_j`` the fractional atom position of ``target_z_j``.  The
    weight tensor is generated on the fly and contracted immediately
    (VPU/MXU-friendly); mathematically identical to
    ``categorical_projection`` (tests/test_distributional.py).

    Dispatches to the VMEM-resident Pallas kernel
    (ops/projection_pallas.py) when ``runner.pallas_kernels`` is on.
    """
    if _dispatch.use_pallas():
        from rlx_tpu.ops.projection_pallas import categorical_projection_pallas

        return categorical_projection_pallas(
            target_z, probs, float(v_min), float(v_max), int(nr_atoms),
            interpret=_dispatch.interpret(),
        )
    delta_z = (v_max - v_min) / (nr_atoms - 1)
    b = (jnp.clip(target_z, v_min, v_max) - v_min) / delta_z      # [..., A_in]
    atoms = jnp.arange(nr_atoms, dtype=probs.dtype)               # [A_out]
    w = jnp.clip(1.0 - jnp.abs(b[..., None, :] - atoms[:, None]), 0.0, 1.0)
    return jnp.einsum("...ij,...j->...i", w, probs)


def hl_gauss_targets(values, v_min, v_max, nr_bins, sigma_ratio=0.75):
    """Histogram-loss-Gaussian target distribution for scalars ``values``
    [...] -> [..., nr_bins]: CDF-difference of a Gaussian centered at the
    value with sigma = sigma_ratio * bin_width."""
    bin_width = (v_max - v_min) / nr_bins
    sigma = sigma_ratio * bin_width
    edges = v_min + bin_width * jnp.arange(nr_bins + 1)
    cdf = jax.scipy.stats.norm.cdf(edges[None, :], values.reshape(-1, 1), sigma)
    z = cdf[:, -1] - cdf[:, 0]
    probs = (cdf[:, 1:] - cdf[:, :-1]) / jnp.maximum(z[:, None], 1e-8)
    return probs.reshape(values.shape + (nr_bins,))


def hl_gauss_expectation(logits, v_min, v_max):
    """Expected value of an HL-Gauss/categorical head using bin centers."""
    nr_bins = logits.shape[-1]
    bin_width = (v_max - v_min) / nr_bins
    centers = v_min + bin_width * (jnp.arange(nr_bins) + 0.5)
    return (jax.nn.softmax(logits, axis=-1) * centers).sum(-1)
