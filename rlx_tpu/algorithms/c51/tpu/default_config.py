"""Defaults follow `rl_x/algorithms/c51/flax/default_config.py`
(flat-obs-friendly sizes; Atari-scale runs override via flags)."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 500_000
    config.learning_rate = 3e-4
    config.anneal_learning_rate = False
    config.buffer_size = 100_000
    config.learning_starts = 10_000
    config.batch_size = 32
    config.gamma = 0.99
    config.v_min = -10.0
    config.v_max = 10.0
    config.nr_atoms = 51
    config.epsilon_start = 1.0
    config.epsilon_end = 0.01
    config.epsilon_decay_steps = 250_000
    config.update_frequency = 4
    config.target_update_frequency = 8_000
    config.critic_hidden_sizes = (512,)
    config.activation = "relu"
    config.shard_local_sampling = True
    config.logging_frequency = 1_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
