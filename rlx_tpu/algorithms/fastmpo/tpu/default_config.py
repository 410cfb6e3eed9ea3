"""Defaults follow `rl_x/algorithms/fastmpo/flax_full_jit/default_config.py`
(the FastSAC flavor of the recipe)."""

from ml_collections import config_dict


def get_config(algorithm_name):
    config = config_dict.ConfigDict()

    config.name = algorithm_name

    config.total_timesteps = 1_000_000
    config.critic_network_type = "fastsac"   # fastsac, fasttd3, mpo
    config.dual_critic = True
    config.policy_network_type = "fastsac"   # fastsac, fasttd3, mpo
    config.action_clipping = False
    config.action_rescaling = "none"         # none, fastsac, normal
    config.learning_rate = 3e-4
    config.policy_learning_rate = 3e-4
    config.critic_learning_rate = 3e-4
    config.dual_learning_rate = 1e-2
    config.anneal_learning_rate = False
    config.policy_weight_decay = 0.001
    config.critic_weight_decay = 0.001
    config.dual_weight_decay = 0.0
    config.adam_beta1 = 0.9
    config.adam_beta2 = 0.95
    config.max_grad_norm = 40.0
    config.collect_data_with_online_policy = False
    config.action_sampling_number = 4
    config.epsilon_non_parametric = 0.1
    config.epsilon_parametric_mu = 0.01
    config.epsilon_parametric_sigma = 1e-6
    config.epsilon_penalty = 0.001
    config.action_penalization = False
    config.init_log_eta = 10.0
    config.init_log_alpha_mean = 10.0
    config.init_log_alpha_stddev = 1000.0
    config.init_log_penalty_temperature = 10.0
    config.min_log_temperature = -18.0
    config.min_log_alpha = -18.0
    config.policy_init_scale = 0.5
    config.policy_min_scale = 0.1
    config.batch_size = 8192                 # fastsac: 8192, fasttd3: 32768
    config.buffer_size_per_env = 1024        # fastsac: 1024, fasttd3: 10240
    config.learning_starts = 0               # derived: learning_starts_per_env * nr_envs
    config.learning_starts_per_env = 10
    config.v_min = -20.0                     # fastsac: +-20, fasttd3: +-10
    config.v_max = 20.0
    config.critic_tau = 0.125                # fastsac: 0.125, fasttd3: 0.1
    config.policy_tau = 0.3
    config.gamma = 0.97
    config.nr_atoms = 101
    config.n_step = 1
    config.clipped_double_q_learning = False
    config.nr_critic_updates_per_policy_update = 4   # fastsac: 4, fasttd3: 2
    config.nr_policy_updates_per_step = 2            # fastsac: 2, fasttd3: 1
    config.enable_observation_normalization = True
    config.policy_hidden_sizes = (512, 256, 128)     # used for network type "mpo"
    config.critic_hidden_sizes = (768, 384, 192)
    config.activation = "silu"
    config.layer_norm = True
    config.shard_local_sampling = True
    config.logging_frequency = 40_960
    config.evaluation_and_save_frequency = -1
    config.evaluation_active = False
    config.logging_active = True
    config.nr_parallel_seeds = 1

    return config
