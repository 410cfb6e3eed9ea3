"""PPO + sliding-window transformer memory (see
rlx_tpu.models.recurrent.TransformerCell;
reference: rl_x/algorithms/ppo_transformer/flax_full_jit/)."""

from rlx_tpu.algorithms.ppo_transformer.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.recurrent_ppo import RecurrentPPO


class PPOTransformer(RecurrentPPO):
    cell_type = "transformer"

    def general_properties():
        return GeneralProperties
