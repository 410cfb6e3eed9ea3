"""Defaults follow `rl_x/algorithms/ddpg/flax/default_config.py`."""

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
    config.epsilon = 0.1
    config.policy_hidden_sizes = (256, 256)
    config.critic_hidden_sizes = (256, 256)
    config.activation = "relu"
    config.layer_norm = False
    config.shard_local_sampling = True
    config.logging_frequency = 3_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
