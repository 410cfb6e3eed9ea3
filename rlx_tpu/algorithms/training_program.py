"""Fused vs chunked execution of the one-program training loop.

Every algorithm's training run is a scan over "eval/save iterations"
(`_eval_save_iteration`), starting from `_init_train_carry(key)`.  Two
execution modes with identical semantics:

- fused (default): the whole run is ONE jitted `lax.scan` — a single XLA
  execution, the reference's flax_full_jit contract
  (`rl_x/algorithms/ppo/flax_full_jit/ppo.py:330-349`);
- chunked (`runner.chunked_train=True`): one bounded jitted device call per
  eval/save iteration with a donated carry.  Needed on tunneled TPU
  transports that drop single multi-minute executions; the carry is
  device-resident throughout, so per-call overhead is one dispatch.

`tests/test_chunked_train.py` pins the two modes to identical eval
histories at a fixed seed.
"""

import jax
import jax.numpy as jnp
import numpy as np


def run_training_program(model, run_key):
    """-> (final_carry, eval_history).

    ``eval_history`` is a dict of stacked per-iteration eval metrics
    ([nr_eval_save_iterations, ...] leaves), or None when evaluation is
    inactive.  In fused mode the leaves are device arrays; chunked mode
    returns numpy (already materialized per iteration).
    """
    n = model.nr_eval_save_iterations
    if getattr(model.config.runner, "chunked_train", False):
        step_fn = jax.jit(model._eval_save_iteration, donate_argnums=0)
        carry = jax.jit(model._init_train_carry)(run_key)
        evals = []
        for i in range(n):
            carry, eval_metrics = step_fn(carry, jnp.asarray(i))
            if eval_metrics is not None:
                evals.append(jax.tree.map(np.asarray, jax.block_until_ready(eval_metrics)))
        carry = jax.block_until_ready(carry)
        eval_history = jax.tree.map(lambda *xs: np.stack(xs), *evals) if evals else None
        return carry, eval_history

    def train_function(key):
        return jax.lax.scan(
            model._eval_save_iteration, model._init_train_carry(key), jnp.arange(n)
        )

    return jax.block_until_ready(jax.jit(train_function)(run_key))
