"""PPO + GRU memory (see rlx_tpu.algorithms.recurrent_ppo for mechanics;
reference: rl_x/algorithms/ppo_gru/flax_full_jit/)."""

from rlx_tpu.algorithms.ppo_gru.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.recurrent_ppo import RecurrentPPO


class PPOGRU(RecurrentPPO):
    cell_type = "gru"

    def general_properties():
        return GeneralProperties
