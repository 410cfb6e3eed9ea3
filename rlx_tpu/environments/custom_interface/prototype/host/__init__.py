"""TCP/JSON custom-interface env (reference:
rl_x/environments/custom_interface/prototype/)."""

from ml_collections import config_dict

from rlx_tpu.environments.custom_interface.prototype.connection import SocketEnv
from rlx_tpu.environments.environment_manager import extract_environment_name_from_file, register_environment
from rlx_tpu.environments.types import (
    ActionSpaceType, DataInterfaceType, ObservationSpaceType, SimulationType,
)


def get_config(environment_name):
    config = config_dict.ConfigDict()
    config.name = environment_name
    config.seed = 1
    config.nr_envs = 1
    config.ip = "127.0.0.1"
    config.port = 11111
    config.horizon = 1000
    config.render = False
    return config


def create_train_and_eval_env(config):
    env = SocketEnv(config.environment.ip, config.environment.port,
                    horizon=config.environment.horizon)
    env.general_properties = GeneralProperties
    return env, env


class GeneralProperties:
    action_space_type = ActionSpaceType.CONTINUOUS
    observation_space_type = ObservationSpaceType.FLAT_VALUES
    data_interface_type = DataInterfaceType.JAX
    simulation_type = SimulationType.HOST


NAME = extract_environment_name_from_file(__file__)
register_environment(NAME, get_config, create_train_and_eval_env, GeneralProperties)
