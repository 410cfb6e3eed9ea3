from rlx_tpu.environments.locomotion.robot.tpu.environment import LocomotionEnv
from rlx_tpu.environments.locomotion.robot.tpu.general_properties import GeneralProperties


def create_train_and_eval_env(config):
    env_config = config.environment
    train_env = LocomotionEnv(env_config, env_config.nr_envs)
    train_env.general_properties = GeneralProperties
    if env_config.copy_train_env_for_eval:
        return train_env, train_env
    eval_env = LocomotionEnv(env_config, env_config.nr_envs)
    eval_env.general_properties = GeneralProperties
    return train_env, eval_env
