"""Native C++ vectorized dm_control suite walker_run (EnvPool-equivalent,
dmc track; reference: rl_x/environments/envpool/dmc/)."""

from ml_collections import config_dict

from rlx_tpu.environments.environment_manager import extract_environment_name_from_file, register_environment
from rlx_tpu.environments.native.batcher import DMCNativeEnvBatch
from rlx_tpu.environments.types import (
    ActionSpaceType, DataInterfaceType, ObservationSpaceType, SimulationType,
)

TASK = "walker_run"


def get_config(environment_name):
    config = config_dict.ConfigDict()
    config.name = environment_name
    config.seed = 1
    config.nr_envs = 8
    config.nr_threads = 0  # 0 = auto
    config.render = False
    return config


def create_train_and_eval_env(config):
    train_env = DMCNativeEnvBatch(TASK, config.environment.nr_envs,
                                  seed=config.environment.seed,
                                  nr_threads=config.environment.nr_threads)
    eval_env = DMCNativeEnvBatch(TASK, config.environment.nr_envs,
                                 seed=config.environment.seed ^ 0x5EED_0E7A,  # disjoint from per-env seed+i streams
                                 nr_threads=config.environment.nr_threads)
    for env in (train_env, eval_env):
        env.general_properties = GeneralProperties
    return train_env, eval_env


class GeneralProperties:
    action_space_type = ActionSpaceType.CONTINUOUS
    observation_space_type = ObservationSpaceType.FLAT_VALUES
    data_interface_type = DataInterfaceType.JAX
    simulation_type = SimulationType.HOST


NAME = extract_environment_name_from_file(__file__)
register_environment(NAME, get_config, create_train_and_eval_env, GeneralProperties)
