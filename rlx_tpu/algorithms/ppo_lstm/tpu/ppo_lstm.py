"""PPO + LSTM memory (see rlx_tpu.algorithms.recurrent_ppo for mechanics;
reference: rl_x/algorithms/ppo_lstm/flax_full_jit/)."""

from rlx_tpu.algorithms.ppo_lstm.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.recurrent_ppo import RecurrentPPO


class PPOLSTM(RecurrentPPO):
    cell_type = "lstm"

    def general_properties():
        return GeneralProperties
