"""PPO + Mamba-2 memory (see rlx_tpu.models.recurrent.Mamba2Cell;
reference: rl_x/algorithms/ppo_mamba2/flax_full_jit/)."""

from rlx_tpu.algorithms.ppo_mamba2.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.recurrent_ppo import RecurrentPPO


class PPOMamba2(RecurrentPPO):
    cell_type = "mamba2"

    def general_properties():
        return GeneralProperties
