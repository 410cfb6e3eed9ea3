"""Defaults follow `rl_x/algorithms/ppo_dtrl/flax/default_config.py` for Gym-scale
tasks; locomotion-scale runs override sizes/LR via dotted flags."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.learning_rate = 3e-4
    config.anneal_learning_rate = True
    config.nr_steps = 128
    config.nr_epochs = 10
    config.minibatch_size = 64
    config.gamma = 0.99
    config.gae_lambda = 0.95
    config.clip_range = 0.2
    config.mean_bound = 0.03
    config.cov_bound = 0.001
    config.trust_region_coef = 10.0
    config.entropy_projection_active = False
    config.min_entropy = -4.0
    config.entropy_coef = 0.0
    config.critic_coef = 0.5
    config.max_grad_norm = 0.5
    config.std_dev = 1.0
    config.action_clipping_and_rescaling = False
    config.policy_hidden_sizes = (64, 64)
    config.critic_hidden_sizes = (64, 64)
    config.activation = "tanh"
    config.layer_norm = False
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = True
    config.logging_active = True  # False: no in-program logging callbacks (bench)
    config.nr_parallel_seeds = 1

    return config
