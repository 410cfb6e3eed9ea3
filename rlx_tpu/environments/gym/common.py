"""Shared registration helper for Gymnasium host environments.

Each task directory stays tiny (reference layout parity,
`rl_x/environments/gym/mujoco/humanoid_v4/`): one call wires config factory +
env factory + properties for a Gymnasium env id.
"""

from ml_collections import config_dict

from rlx_tpu.environments.gym.host_bridge import HostGymEnv
from rlx_tpu.environments.types import (
    ActionSpaceType,
    DataInterfaceType,
    ObservationSpaceType,
    SimulationType,
)


def make_gym_registration(env_id, discrete=False, nr_envs=8):
    def get_config(environment_name):
        config = config_dict.ConfigDict()
        config.name = environment_name
        config.env_id = env_id
        config.seed = 1
        config.nr_envs = nr_envs
        config.vectorization = "sync"  # sync | process (forkserver workers)
        config.async_workers = 0  # > 0: thread-pool stepping (sync mode)
        config.async_skip_percentage = 0.0  # fraction of slowest envs to skip
        config.render = False
        return config

    def create_train_and_eval_env(config):
        train_env = HostGymEnv(config.environment.env_id, config.environment.nr_envs,
                               seed=config.environment.seed,
                               async_workers=config.environment.async_workers,
                               async_skip_percentage=config.environment.async_skip_percentage,
                               vectorization=config.environment.vectorization)
        eval_env = HostGymEnv(config.environment.env_id, config.environment.nr_envs,
                              seed=config.environment.seed + 10_000)
        for env in (train_env, eval_env):
            env.general_properties = general_properties
        return train_env, eval_env

    class general_properties:  # noqa: N801 - instance-like class record
        action_space_type = ActionSpaceType.DISCRETE if discrete else ActionSpaceType.CONTINUOUS
        observation_space_type = ObservationSpaceType.FLAT_VALUES
        data_interface_type = DataInterfaceType.JAX  # bridged into the jit via io_callback
        simulation_type = SimulationType.HOST

    return get_config, create_train_and_eval_env, general_properties
