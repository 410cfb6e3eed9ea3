from rlx_tpu.environments.classic.pendulum.tpu.environment import Pendulum
from rlx_tpu.environments.classic.pendulum.tpu.general_properties import GeneralProperties


def create_train_and_eval_env(config):
    train_env = Pendulum(config.environment.nr_envs, config.environment.horizon)
    eval_env = Pendulum(config.environment.nr_envs, config.environment.horizon)
    if config.environment.mask_velocity:
        # POMDP variant: observation is [cos th, sin th] only — requires
        # memory to solve (see wrappers.ObservationMaskWrapper)
        from rlx_tpu.environments.wrappers import ObservationMaskWrapper

        train_env = ObservationMaskWrapper(train_env, [0, 1])
        eval_env = ObservationMaskWrapper(eval_env, [0, 1])
    for env in (train_env, eval_env):
        env.general_properties = GeneralProperties
    return train_env, eval_env
