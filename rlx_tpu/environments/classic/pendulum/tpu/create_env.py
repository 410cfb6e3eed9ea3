from rlx_tpu.environments.classic.pendulum.tpu.environment import Pendulum
from rlx_tpu.environments.classic.pendulum.tpu.general_properties import GeneralProperties


def create_train_and_eval_env(config):
    train_env = Pendulum(config.environment.nr_envs, config.environment.horizon)
    eval_env = Pendulum(config.environment.nr_envs, config.environment.horizon)
    for env in (train_env, eval_env):
        env.general_properties = GeneralProperties
    return train_env, eval_env
