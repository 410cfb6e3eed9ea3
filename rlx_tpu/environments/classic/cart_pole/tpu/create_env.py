from rlx_tpu.environments.classic.cart_pole.tpu.environment import CartPole
from rlx_tpu.environments.classic.cart_pole.tpu.general_properties import GeneralProperties


def create_train_and_eval_env(config):
    train_env = CartPole(config.environment.nr_envs, config.environment.horizon)
    eval_env = CartPole(config.environment.nr_envs, config.environment.horizon)
    for env in (train_env, eval_env):
        env.general_properties = GeneralProperties
    return train_env, eval_env
