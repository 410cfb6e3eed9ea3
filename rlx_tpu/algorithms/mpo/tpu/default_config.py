"""Defaults follow `rl_x/algorithms/mpo/flax/default_config.py`."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4
    config.dual_learning_rate = 1e-2
    config.anneal_learning_rate = False
    config.buffer_size = 1_000_000
    config.learning_starts = 5_000
    config.batch_size = 256
    config.actor_update_period = 1_000
    config.target_network_update_period = 100
    config.gamma = 0.99
    config.n_step = 4
    config.action_sampling_number = 20
    config.max_grad_norm = 40.0
    config.epsilon_non_parametric = 0.1
    config.epsilon_parametric_mu = 0.01
    config.epsilon_parametric_sigma = 1e-6
    config.epsilon_penalty = 0.001
    config.action_penalization = True
    config.init_log_eta = 10.0
    config.init_log_alpha_mean = 10.0
    config.init_log_alpha_stddev = 1000.0
    config.init_log_penalty_temperature = 10.0
    config.policy_init_scale = 0.5
    config.policy_min_scale = 1e-6
    config.v_min = -1600.0
    config.v_max = 1600.0
    config.nr_atoms = 51
    config.enable_observation_normalization = False
    config.policy_hidden_sizes = (256, 256)
    config.critic_hidden_sizes = (256, 256)
    config.activation = "elu"
    config.layer_norm = True
    config.shard_local_sampling = True
    config.logging_frequency = 5_000
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
