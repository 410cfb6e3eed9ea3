"""Defaults follow rl_x/algorithms/ppo_gru/flax_full_jit/default_config.py."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4
    config.anneal_learning_rate = True
    config.nr_steps = 128
    config.nr_epochs = 10
    config.nr_minibatches = 4
    config.gamma = 0.99
    config.gae_lambda = 0.95
    config.clip_range = 0.2
    config.entropy_coef = 0.0
    config.critic_coef = 0.5
    config.max_grad_norm = 0.5
    config.std_dev = 1.0
    config.action_clipping_and_rescaling = False
    config.obs_encoding_dim = 128
    config.rnn_hidden_dim = 64
    config.rnn_obs_combine_method = "concat"  # concat, film
    config.share_rnn_obs_encoder = False
    config.critic_hidden_sizes = (512, 256, 128)
    config.activation = "elu"
    config.layer_norm = True
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
