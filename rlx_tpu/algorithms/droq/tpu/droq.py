"""DroQ: dropout Q-functions.

Parity with `rl_x/algorithms/droq/flax/droq.py`: 2 critics with
Dropout(0.01) + LayerNorm in every hidden layer, min-target, UTD 20.
The dropout ensemble substitutes for REDQ's big explicit ensemble.
"""

import jax.numpy as jnp

from rlx_tpu.algorithms.droq.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac_ensembles import EnsembleSAC


class DroQ(EnsembleSAC):
    def setup_states(self):
        a = self.config.algorithm
        self.q_update_steps = a.q_update_steps
        return super().setup_states()

    def target_q_aggregate(self, next_q, key):
        return jnp.min(next_q, axis=0)

    def policy_q_aggregate(self, q_pi):
        return jnp.min(q_pi, axis=0)

    def general_properties():
        return GeneralProperties
