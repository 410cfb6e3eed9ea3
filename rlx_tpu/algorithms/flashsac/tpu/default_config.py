"""Defaults follow `rl_x/algorithms/flashsac/flax/default_config.py`
(learning-rate warmup-cosine band, categorical critic grid, zeta noise)."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4  # base (core bookkeeping); schedule below
    config.learning_rate_init = 3e-4
    config.learning_rate_peak = 3e-4
    config.learning_rate_end = 1.5e-4
    config.learning_rate_warmup_steps = 0
    config.buffer_size = 1_000_000
    config.learning_starts = 10_000
    config.batch_size = 512
    config.policy_delay = 2
    config.gamma = 0.99
    config.n_step = 1
    config.tau = 0.01
    config.policy_hidden_dim = 128
    config.policy_nr_blocks = 2
    config.critic_hidden_dim = 256
    config.critic_nr_blocks = 2
    config.nr_critics = 2
    config.nr_atoms = 101
    config.normalized_g_max = 5.0
    config.v_min = -5.0
    config.v_max = 5.0
    config.init_entropy_coefficient = 0.01
    config.target_entropy_sigma = 0.15
    config.enable_reward_normalization = True
    config.noise_zeta_mu = 2.0
    config.noise_zeta_max_repeat = 16
    config.shard_local_sampling = True
    config.logging_frequency = 5_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
