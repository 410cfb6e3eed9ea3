"""AQE: aggressive Q-value ensemble.

Parity with `rl_x/algorithms/aqe/flax/aqe.py`: ensemble of 10 critics; the
target drops the ``nr_dropped_q_values`` highest per sample and averages the
rest; UTD 5; policy uses the same pessimistic aggregation.
"""

import jax.numpy as jnp

from rlx_tpu.algorithms.aqe.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac_ensembles import EnsembleSAC


class AQE(EnsembleSAC):
    def setup_states(self):
        a = self.config.algorithm
        self.q_update_steps = a.q_update_steps
        self.nr_dropped = a.nr_dropped_q_values
        return super().setup_states()

    def _drop_highest_mean(self, q):
        q_sorted = jnp.sort(q, axis=0)  # ascending over ensemble axis
        kept = q_sorted[: q.shape[0] - self.nr_dropped]
        return kept.mean(axis=0)

    def target_q_aggregate(self, next_q, key):
        return self._drop_highest_mean(next_q)

    def policy_q_aggregate(self, q_pi):
        return self._drop_highest_mean(q_pi)

    def general_properties():
        return GeneralProperties
