from rlx_tpu.environments.locomotion.soccer.tpu.environment import SoccerEnv
from rlx_tpu.environments.locomotion.soccer.tpu.general_properties import GeneralProperties


def create_train_and_eval_env(config):
    env_config = config.environment
    train_env = SoccerEnv(env_config, env_config.nr_envs)
    train_env.general_properties = GeneralProperties
    if env_config.copy_train_env_for_eval:
        return train_env, train_env
    eval_env = SoccerEnv(env_config, env_config.nr_envs)
    eval_env.general_properties = GeneralProperties
    return train_env, eval_env
