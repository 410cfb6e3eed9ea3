"""Double DQN: online-net argmax, target-net evaluation.

Parity with `rl_x/algorithms/ddqn/flax/ddqn.py` — identical to DQN except
the decoupled target selection below.
"""

import jax.numpy as jnp

from rlx_tpu.algorithms.ddqn.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.dqn.tpu.dqn import DQN


class DDQN(DQN):
    def next_q_target(self, states, batch):
        next_q_online = self.q_net.apply(states["critic"].params, batch["next_observation"])
        best_action = jnp.argmax(next_q_online, axis=-1)
        next_q_target = self.q_net.apply(states["critic"].target_params, batch["next_observation"])
        return jnp.take_along_axis(next_q_target, best_action[:, None], axis=-1).squeeze(-1)

    def general_properties():
        return GeneralProperties
