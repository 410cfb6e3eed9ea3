"""TrainState with target parameters, shared by off-policy algorithms.

Reference idiom: ``RLTrainState`` duplicated per algorithm directory
(`rl_x/algorithms/sac/flax/rl_train_state.py:5-6`); here it is shared.
"""

from flax.training.train_state import TrainState
from flax import core, struct


class RLTrainState(TrainState):
    target_params: core.FrozenDict = struct.field(pytree_node=True, default=None)
