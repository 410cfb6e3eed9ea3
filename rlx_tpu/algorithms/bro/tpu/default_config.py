"""Defaults follow `rl_x/algorithms/bro/flax/default_config.py`
(with Gym-scale logging cadence)."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4
    config.anneal_learning_rate = False
    config.buffer_size = 1_000_000
    config.learning_starts = 2_500
    config.batch_size = 128
    config.tau = 0.005
    config.gamma = 0.99
    config.target_entropy = "auto"
    config.log_std_min = -20.0
    config.log_std_max = 2.0
    config.policy_hidden_sizes = (256, 256)  # unused (BroNet dims below)
    config.critic_hidden_sizes = (256, 256)  # unused
    config.policy_hidden_dim = 256
    config.policy_nr_blocks = 1
    config.critic_hidden_dim = 512
    config.critic_nr_blocks = 2
    config.nr_quantiles = 100
    config.updates_per_step = 10
    config.std_multiplier = 0.75
    config.use_optimistic_exploration = True
    config.adjustment_learning_rate = 3e-5
    config.pessimism = 0.0
    config.kl_target = 0.05
    config.init_optimism = 1.0
    config.init_regularizer = 0.25
    config.first_reset_step = 15_000
    config.reset_interval = 500_000
    config.nr_critics = 2
    config.activation = "relu"
    config.layer_norm = False
    config.shard_local_sampling = True
    config.logging_frequency = 5_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
