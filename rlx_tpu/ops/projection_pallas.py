"""Categorical (C51) projection as a Pallas TPU kernel.

The dense hat-kernel contraction (`distributional.categorical_projection_dense`)
generates a [..., A_out, A_in] weight tensor that XLA materializes in HBM
tile by tile; for the fast-family critics (batch 8192+, 101 atoms) that is
~100x the payload traffic.  This kernel tiles the flattened batch axis and
keeps the weight generation entirely in VMEM: each program loads its
[BLOCK_N, A] slab of positions and probabilities once, loops over input
atoms accumulating ``clip(1 - |b_j - i|, 0, 1) * p_j`` into a [BLOCK_N,
A_out] accumulator, and writes the projected distribution once — HBM
traffic is exactly input + output.

NOTE on hosted TPUs: the tunneled `axon` platform hangs on ANY Mosaic
kernel launch (see ops/gae_pallas.py), so this kernel is validated in
interpreter mode (tests/test_distributional.py) and benchmarked on
directly-attached TPUs; the dense XLA contraction stays the default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _projection_kernel(z_ref, p_ref, out_ref, *, v_min, v_max, nr_atoms, nr_in_atoms):
    delta_z = (v_max - v_min) / (nr_atoms - 1)
    b = (jnp.clip(z_ref[...], v_min, v_max) - v_min) / delta_z    # [N, A_in]
    p = p_ref[...]
    atoms = jax.lax.broadcasted_iota(b.dtype, (1, nr_atoms), 1)   # [1, A_out]

    def body(j, acc):
        b_col = jax.lax.dynamic_slice_in_dim(b, j, 1, axis=1)     # [N, 1]
        p_col = jax.lax.dynamic_slice_in_dim(p, j, 1, axis=1)
        w = jnp.clip(1.0 - jnp.abs(b_col - atoms), 0.0, 1.0)      # [N, A_out]
        return acc + w * p_col

    out_ref[...] = jax.lax.fori_loop(
        0, nr_in_atoms, body, jnp.zeros_like(out_ref)
    )


@functools.partial(
    jax.jit, static_argnames=("v_min", "v_max", "nr_atoms", "block_n", "interpret")
)
def categorical_projection_pallas(target_z, probs, v_min, v_max, nr_atoms,
                                  block_n=256, interpret=False):
    """target_z/probs [..., A_in] -> projected [..., nr_atoms]."""
    in_atoms = target_z.shape[-1]
    lead_shape = target_z.shape[:-1]
    z = target_z.reshape(-1, in_atoms)
    p = probs.reshape(-1, in_atoms).astype(jnp.float32)
    N = z.shape[0]
    block_n = min(block_n, N)

    grid = (pl.cdiv(N, block_n),)
    in_spec = pl.BlockSpec((block_n, in_atoms), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_n, nr_atoms), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _projection_kernel, v_min=v_min, v_max=v_max,
            nr_atoms=nr_atoms, nr_in_atoms=in_atoms,
        ),
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, nr_atoms), jnp.float32),
        interpret=interpret,
    )(z.astype(jnp.float32), p)
    return out.reshape(lead_shape + (nr_atoms,))
