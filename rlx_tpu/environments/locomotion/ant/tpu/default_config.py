"""Mirrors `rl_x/environments/custom_mujoco/ant/mjx/default_config.py`."""

from ml_collections import config_dict


def get_config(environment_name):
    config = config_dict.ConfigDict()

    config.name = environment_name

    config.seed = 1
    config.nr_envs = 4096
    config.horizon = 1000
    config.action_scaling_factor = 0.3
    config.nr_substeps = 4
    config.copy_train_env_for_eval = True
    config.initial_state_noise = 0.0
    config.perturbation_chance = 0.0
    config.perturbation_velocity = 0.5
    config.render = False

    return config
