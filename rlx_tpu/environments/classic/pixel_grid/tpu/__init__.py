"""Device-resident image-observation grid world (IMAGES path for the DQN
family; Atari itself is gated on ale_py availability)."""

from ml_collections import config_dict

from rlx_tpu.environments.classic.pixel_grid.tpu.environment import PixelGrid
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
    config.render = False
    return config


def create_train_and_eval_env(config):
    train_env = PixelGrid(config.environment.nr_envs, config.environment.horizon)
    eval_env = PixelGrid(config.environment.nr_envs, config.environment.horizon)
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
