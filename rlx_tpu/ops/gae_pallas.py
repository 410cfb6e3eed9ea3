"""Fused GAE as a Pallas TPU kernel.

The scan-based GAE (rlx_tpu/ops/gae.py) launches T sequential [B]-wide VPU
steps through XLA's loop machinery; this kernel fuses the whole reverse
recurrence into ONE kernel invocation: deltas are computed in-kernel, the
running advantage lives in registers/VMEM, and the grid tiles the env-batch
axis so each program streams its [T, BLOCK_B] slab once (HBM-optimal:
each element is read once and written once).

Grid: (cdiv(B, BLOCK_B),) — programs are independent env columns.
Layout: time-major [T, B] float32, B on the 128-wide lane axis.

NOTE on hosted TPUs: the tunneled `axon` platform in the round-1 dev
environment hangs on ANY Mosaic kernel launch (even a trivial elementwise
pallas_call), so this kernel is validated in interpreter mode
(tests/test_gae.py) and benchmarked on directly-attached TPUs only; the
lax.scan implementation stays the default.

Equivalent math to `gae_advantages` (verified in tests/test_gae.py):
    delta[t] = r[t] + gamma * next_v[t] * (1 - d[t]) - v[t]
    adv[t]   = delta[t] + gamma * lam * (1 - d[t]) * adv[t+1]
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gae_kernel(rewards_ref, values_ref, next_values_ref, nonterminal_ref,
                adv_ref, ret_ref, *, gamma, gae_lambda, nr_steps):
    def body(i, carry):
        t = nr_steps - 1 - i
        row = pl.ds(t, 1)
        nonterminal = nonterminal_ref[row, :]
        delta = (
            rewards_ref[row, :]
            + gamma * next_values_ref[row, :] * nonterminal
            - values_ref[row, :]
        )
        advantage = delta + gamma * gae_lambda * nonterminal * carry
        adv_ref[row, :] = advantage
        ret_ref[row, :] = advantage + values_ref[row, :]
        return advantage

    zero = jnp.zeros_like(rewards_ref[pl.ds(0, 1), :])
    jax.lax.fori_loop(0, nr_steps, body, zero)


@functools.partial(jax.jit, static_argnames=("gamma", "gae_lambda", "block_b", "interpret"))
def gae_advantages_pallas(rewards, values, next_values, terminations,
                          gamma, gae_lambda, block_b=512, interpret=False):
    """Inputs [T, B] float32 (terminations may be bool); returns
    (advantages, returns).  ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU tests)."""
    T, B = rewards.shape
    block_b = min(block_b, B)
    nonterminal = 1.0 - terminations.astype(rewards.dtype)

    grid = (pl.cdiv(B, block_b),)
    spec = pl.BlockSpec((T, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)

    adv, ret = pl.pallas_call(
        functools.partial(_gae_kernel, gamma=gamma, gae_lambda=gae_lambda, nr_steps=T),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((T, B), rewards.dtype),
            jax.ShapeDtypeStruct((T, B), rewards.dtype),
        ),
        interpret=interpret,
    )(rewards, values, next_values, nonterminal)
    return adv, ret
