"""PPO over a fixed window of recent observations.

Parity with `rl_x/algorithms/ppo_history_window/flax_full_jit/` (window of
the last ``window_length`` observations encoded by the MLP policy,
`default_config.py:25-28`); realized by composing standard PPO with the
ObservationWindowWrapper so the mechanism works for any algorithm.
"""

from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
from rlx_tpu.algorithms.ppo_history_window.tpu.general_properties import GeneralProperties
from rlx_tpu.environments.wrappers import ObservationWindowWrapper


class PPOHistoryWindow(PPO):
    def __init__(self, config, train_env, eval_env, run_path, writer):
        window = config.algorithm.window_length
        wrapped_train = ObservationWindowWrapper(train_env, window)
        wrapped_eval = (
            wrapped_train if eval_env is train_env else ObservationWindowWrapper(eval_env, window)
        )
        super().__init__(config, wrapped_train, wrapped_eval, run_path, writer)

    def general_properties():
        return GeneralProperties
