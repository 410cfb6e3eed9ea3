"""PPO with learned memory through the action space.

Parity with `rl_x/algorithms/ppo_memory_actions/flax_full_jit/policy.py:16,42-52`:
the policy emits ``memory_action_dimension`` extra outputs that are appended
to the next observation; realized by composing standard PPO with the
MemoryActionsWrapper.
"""

from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
from rlx_tpu.algorithms.ppo_memory_actions.tpu.general_properties import GeneralProperties
from rlx_tpu.environments.wrappers import MemoryActionsWrapper


class PPOMemoryActions(PPO):
    def __init__(self, config, train_env, eval_env, run_path, writer):
        mem = config.algorithm.memory_action_dimension
        clip = float(getattr(config.algorithm, "memory_action_clip", 10.0))
        wrapped_train = MemoryActionsWrapper(train_env, mem, memory_clip=clip)
        wrapped_eval = (
            wrapped_train if eval_env is train_env
            else MemoryActionsWrapper(eval_env, mem, memory_clip=clip)
        )
        super().__init__(config, wrapped_train, wrapped_eval, run_path, writer)

    def general_properties():
        return GeneralProperties
