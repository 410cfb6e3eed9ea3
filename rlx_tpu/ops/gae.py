"""Generalized Advantage Estimation as a fused reverse scan.

Semantics match `rl_x/algorithms/ppo/flax_full_jit/ppo.py:161-173` /
`rl_x/algorithms/ppo/flax/ppo.py:122-135`: ``terminations[t]`` is True when
transition t ended in a true termination (never truncation), and
``next_values`` are computed from the *pre-auto-reset* observation
(``final_observation``), so truncated episodes bootstrap correctly.

Implementation is a single ``lax.scan(reverse=True)`` over time-major
``[T, B]`` arrays — one fused XLA loop with ``[B]``-wide VPU bodies, instead
of the reference's index-array scan + reversal/concatenate
(`ppo/flax_full_jit/ppo.py:170-171`).
"""

import jax
import jax.numpy as jnp

from rlx_tpu.ops import _dispatch


def gae_advantages(rewards, values, next_values, terminations, gamma, gae_lambda):
    """All inputs ``[T, B]`` float32 (terminations may be bool). Returns
    (advantages, returns), both ``[T, B]``.

    Dispatches to the fused Pallas kernel (ops/gae_pallas.py) when
    ``runner.pallas_kernels`` is on (direct-attached TPUs)."""
    if _dispatch.use_pallas():
        from rlx_tpu.ops.gae_pallas import gae_advantages_pallas

        return gae_advantages_pallas(
            rewards, values, next_values, terminations,
            float(gamma), float(gae_lambda), interpret=_dispatch.interpret(),
        )
    terminations = terminations.astype(rewards.dtype)
    deltas = rewards + gamma * next_values * (1.0 - terminations) - values

    def body(next_advantage, delta_term):
        delta, termination = delta_term
        advantage = delta + gamma * gae_lambda * (1.0 - termination) * next_advantage
        return advantage, advantage

    _, advantages = jax.lax.scan(
        body, jnp.zeros_like(deltas[-1]), (deltas, terminations), reverse=True
    )
    returns = advantages + values
    return advantages, returns
