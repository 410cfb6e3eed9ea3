"""Defaults follow `rl_x/algorithms/fasttd3/flax_full_jit/default_config.py`
(scaled down to Gym-size defaults; locomotion runs override via flags)."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4
    config.anneal_learning_rate = False
    config.weight_decay = 0.1
    config.buffer_size = 1_000_000
    config.learning_starts = 5_000
    config.batch_size = 256
    config.v_min = -10.0
    config.v_max = 10.0
    config.tau = 0.1
    config.gamma = 0.97
    config.nr_atoms = 101
    config.n_step = 1
    config.noise_std_min = 0.001
    config.noise_std_max = 0.4
    config.smoothing_epsilon = 0.001
    config.smoothing_clip_value = 0.5
    config.nr_critic_updates_per_policy_update = 2
    config.clipped_double_q_learning = True
    config.enable_observation_normalization = True
    config.policy_hidden_sizes = (512, 256, 128)
    config.critic_hidden_sizes = (512, 256, 128)
    config.activation = "elu"
    config.layer_norm = True
    config.shard_local_sampling = True
    config.logging_frequency = 5_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
