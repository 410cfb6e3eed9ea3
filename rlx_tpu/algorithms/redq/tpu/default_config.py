"""Defaults follow `rl_x/algorithms/redq/flax/default_config.py`."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4
    config.anneal_learning_rate = False
    config.buffer_size = 1_000_000
    config.learning_starts = 5_000
    config.batch_size = 256
    config.tau = 0.005
    config.gamma = 0.99
    config.target_entropy = "auto"
    config.log_std_min = -20.0
    config.log_std_max = 2.0
    config.policy_hidden_sizes = (256, 256)
    config.critic_hidden_sizes = (256, 256)
    config.activation = "relu"
    config.layer_norm = False
    config.shard_local_sampling = True
    config.logging_frequency = 5_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1
    config.nr_critics = 10
    config.in_target_minimization = 2
    config.q_update_steps = 20

    return config
