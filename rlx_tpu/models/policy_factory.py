"""Policy adapters: one PPO/actor-critic codepath for all space types.

The reference selects policy modules per space type inside each algorithm
directory (`rl_x/algorithms/ppo/flax_full_jit/policy.py:13-22`; discrete and
image support only in the pytorch variant `ppo/pytorch/policy.py:33-203`).
Here a single adapter interface covers CONTINUOUS/DISCRETE x FLAT/IMAGES for
every on-policy algorithm, so the JAX build re-covers the pytorch-only
capabilities (SURVEY.md §7 design stance).
"""

from typing import Any, NamedTuple, Callable

import jax.numpy as jnp

from rlx_tpu.environments.types import ActionSpaceType, ObservationSpaceType
from rlx_tpu.models import distributions as D
from rlx_tpu.models.mlp import (
    CategoricalPolicy,
    GaussianPolicy,
    VCritic,
    get_processed_action_function,
)


def _compute_dtype(config):
    """Trunk compute dtype from ``algorithm.compute_dtype`` (None = f32)."""
    name = getattr(config.algorithm, "compute_dtype", "float32")
    return jnp.bfloat16 if name == "bfloat16" else None


class PolicyAdapter(NamedTuple):
    module: Any
    sample_and_log_prob: Callable  # (params, obs, key) -> (action, log_prob)
    log_prob_entropy: Callable     # (params, obs, action) -> (log_prob, entropy)
    mode: Callable                 # (params, obs) -> deterministic action
    process_action: Callable       # raw action -> env action


def make_policy(config, env):
    """Build the policy adapter for ``env`` from ``config.algorithm``."""
    action_space_type = env.general_properties.action_space_type
    observation_space_type = env.general_properties.observation_space_type
    # IMAGES: NatureCNN encoder feeding the same heads — re-covers the
    # reference's pytorch-only image PPO (`ppo/pytorch/policy.py:33-203`).
    vision = observation_space_type == ObservationSpaceType.IMAGES

    hidden = tuple(config.algorithm.policy_hidden_sizes)
    activation = config.algorithm.activation
    layer_norm = config.algorithm.layer_norm
    obs_indices = getattr(env, "policy_observation_indices", None)
    dtype = _compute_dtype(config)

    if action_space_type == ActionSpaceType.CONTINUOUS:
        action_dim = int(jnp.prod(jnp.asarray(env.single_action_space.shape)))
        module = GaussianPolicy(
            action_dim=action_dim,
            hidden_sizes=hidden,
            activation=activation,
            layer_norm=layer_norm,
            std_dev=config.algorithm.std_dev,
            observation_indices=obs_indices,
            vision=vision,
            dtype=dtype,
        )
        process = get_processed_action_function(
            config.algorithm.action_clipping_and_rescaling,
            env.single_action_space.low,
            env.single_action_space.high,
        )

        def sample_and_log_prob(params, obs, key):
            mean, logstd = module.apply(params, obs)
            action = D.gaussian_sample(key, mean, logstd)
            return action, D.gaussian_log_prob(mean, logstd, action)

        def log_prob_entropy(params, obs, action):
            mean, logstd = module.apply(params, obs)
            log_prob = D.gaussian_log_prob(mean, logstd, action)
            entropy = jnp.broadcast_to(D.gaussian_entropy(logstd), log_prob.shape)
            return log_prob, entropy

        def mode(params, obs):
            mean, _ = module.apply(params, obs)
            return mean

    elif action_space_type == ActionSpaceType.DISCRETE:
        module = CategoricalPolicy(
            nr_actions=env.single_action_space.n,
            hidden_sizes=hidden,
            activation=activation,
            layer_norm=layer_norm,
            observation_indices=obs_indices,
            vision=vision,
            dtype=dtype,
        )
        process = lambda a: a

        def sample_and_log_prob(params, obs, key):
            logits = module.apply(params, obs)
            action = D.categorical_sample(key, logits)
            return action, D.categorical_log_prob(logits, action)

        def log_prob_entropy(params, obs, action):
            logits = module.apply(params, obs)
            return D.categorical_log_prob(logits, action), D.categorical_entropy(logits)

        def mode(params, obs):
            return jnp.argmax(module.apply(params, obs), axis=-1)

    else:
        raise NotImplementedError(action_space_type)

    return PolicyAdapter(module, sample_and_log_prob, log_prob_entropy, mode, process)


def make_critic(config, env):
    obs_indices = getattr(env, "critic_observation_indices", None)
    return VCritic(
        hidden_sizes=tuple(config.algorithm.critic_hidden_sizes),
        activation=config.algorithm.activation,
        layer_norm=config.algorithm.layer_norm,
        observation_indices=obs_indices,
        vision=env.general_properties.observation_space_type == ObservationSpaceType.IMAGES,
        dtype=_compute_dtype(config),
    )
