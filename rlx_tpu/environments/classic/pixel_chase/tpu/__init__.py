"""Frame-stack-requiring image env (moving goal): the Atari-shaped pixel
track for the DQN family while ale_py is absent from the image."""

from ml_collections import config_dict

from rlx_tpu.environments.classic.pixel_chase.tpu.environment import PixelChase
from rlx_tpu.environments.environment_manager import extract_environment_name_from_file, register_environment
from rlx_tpu.environments.types import (
    ActionSpaceType, DataInterfaceType, ObservationSpaceType, SimulationType,
)


def get_config(environment_name):
    config = config_dict.ConfigDict()
    config.name = environment_name
    config.seed = 1
    config.nr_envs = 8
    config.horizon = 64
    config.frame_stack = 4
    config.goal_period = 1
    config.render = False
    return config


def create_train_and_eval_env(config):
    e = config.environment
    train_env = PixelChase(e.nr_envs, e.horizon, e.frame_stack, e.goal_period)
    eval_env = PixelChase(e.nr_envs, e.horizon, e.frame_stack, e.goal_period)
    for env in (train_env, eval_env):
        env.general_properties = GeneralProperties
    return train_env, eval_env


class GeneralProperties:
    action_space_type = ActionSpaceType.DISCRETE
    observation_space_type = ObservationSpaceType.IMAGES
    data_interface_type = DataInterfaceType.JAX
    simulation_type = SimulationType.DEVICE


NAME = extract_environment_name_from_file(__file__)
register_environment(NAME, get_config, create_train_and_eval_env, GeneralProperties)
