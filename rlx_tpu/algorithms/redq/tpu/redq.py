"""REDQ: randomized ensemble double Q-learning.

Parity with `rl_x/algorithms/redq/flax/redq.py`: ensemble of 10 critics,
target = min over a random 2-subset, UTD 20 critic updates per env step,
policy trained on the ensemble mean.
"""

import jax
import jax.numpy as jnp

from rlx_tpu.algorithms.redq.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac_ensembles import EnsembleSAC


class REDQ(EnsembleSAC):
    def setup_states(self):
        a = self.config.algorithm
        self.q_update_steps = a.q_update_steps
        self.in_target_minimization = a.in_target_minimization
        states = super().setup_states()
        return states

    def target_q_aggregate(self, next_q, key):
        idx = jax.random.choice(
            key, next_q.shape[0], (self.in_target_minimization,), replace=False
        )
        return jnp.min(next_q[idx], axis=0)

    def policy_q_aggregate(self, q_pi):
        return jnp.mean(q_pi, axis=0)

    def general_properties():
        return GeneralProperties
