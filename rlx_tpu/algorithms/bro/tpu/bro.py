"""BRO: bigger, regularized, optimistic.

Parity with `rl_x/algorithms/bro/flax/bro.py`: BroNet residual trunks
(`bro/flax/layers.py`), twin quantile critics (100 quantiles,
quantile-Huber loss) with pessimism-weighted target aggregation
(`bro/flax/bro.py:180-184`), high UTD (``updates_per_step``), periodic
full parameter resets (``first_reset_step`` / ``reset_interval`` — BRO's
plasticity trick, realized in-jit by select-restoring the stored initial
parameters), and the full optimistic-exploration machinery
(`bro/flax/bro.py:228-268`, `bro/flax/policy.py:79-97`): a second
"optimistic" actor that predicts a mean shift on top of the pessimistic
policy and is trained against the Q upper bound, plus learned optimism /
regularizer dual variables driven toward ``kl_target``
(`bro/flax/entropy_coefficient.py:15-24` Adjustment parameterization).
Training-time actions are sampled from the optimistic policy
(`bro/flax/bro.py:154-160,326`); eval stays deterministic-pessimistic.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.bro.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac_ensembles import EnsembleSAC
from rlx_tpu.algorithms.tqc.tpu.tqc import quantile_huber_loss
from rlx_tpu.models import distributions as D
from rlx_tpu.models.layers import BroNetEncoder


class BroPolicy(nn.Module):
    action_dim: int
    hidden_dim: int
    nr_blocks: int
    log_std_min: float = -10.0
    log_std_max: float = 2.0
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, x):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        x = BroNetEncoder(self.hidden_dim, self.nr_blocks)(x)
        mean = nn.Dense(self.action_dim)(x)
        log_std = nn.Dense(self.action_dim)(x)
        log_std = self.log_std_min + (self.log_std_max - self.log_std_min) * 0.5 * (
            1.0 + jnp.tanh(log_std)
        )
        return mean, log_std


class BroDualPolicy(nn.Module):
    """Optimistic actor: mean shift on top of the pessimistic policy.

    Mirrors `bro/flax/policy.py:79-97` (DualTanhPolicy): input is
    [obs, base_mean]; output mean is base_mean + small learned shift and the
    std is the pessimistic std scaled by ``std_multiplier``.
    """

    action_dim: int
    hidden_dim: int
    nr_blocks: int
    scale_means: float = 0.01
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, base_mean, base_std, std_multiplier):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, base_mean], axis=-1)
        x = BroNetEncoder(self.hidden_dim, self.nr_blocks)(x)
        shift = nn.Dense(
            self.action_dim, use_bias=False,
            kernel_init=nn.initializers.orthogonal(self.scale_means),
        )(x)
        return base_mean + shift, base_std * std_multiplier


class Adjustment(nn.Module):
    """Positive learned scalar with a tanh-bounded log value
    (`bro/flax/entropy_coefficient.py:15-24`)."""

    init_value: float = 1.0
    log_val_min: float = -10.0
    log_val_max: float = 7.5

    @nn.compact
    def __call__(self):
        ratio = (math.log(self.init_value) - self.log_val_min) / (
            (self.log_val_max - self.log_val_min) * 0.5
        ) - 1.0
        init = math.atanh(ratio)
        log_value = self.param("raw", lambda key: jnp.full((), init, jnp.float32))
        log_value = self.log_val_min + (self.log_val_max - self.log_val_min) * 0.5 * (
            1.0 + jnp.tanh(log_value)
        )
        return jnp.exp(log_value)


class BroQuantileCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_quantiles: int
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        x = BroNetEncoder(self.hidden_dim, self.nr_blocks)(x)
        return nn.Dense(self.nr_quantiles)(x)


class BroVectorCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_quantiles: int
    nr_critics: int = 2
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        ensemble = nn.vmap(
            BroQuantileCritic,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(
            self.hidden_dim, self.nr_blocks, self.nr_quantiles, self.observation_indices
        )(obs, action)


class BRO(EnsembleSAC):
    def _build_policy(self, a):
        return BroPolicy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            nr_blocks=a.policy_nr_blocks,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def _build_critic(self, a):
        self.nr_quantiles = a.nr_quantiles
        taus = (jnp.arange(self.nr_quantiles) + 0.5) / self.nr_quantiles
        self.taus = taus
        return BroVectorCritic(
            hidden_dim=a.critic_hidden_dim,
            nr_blocks=a.critic_nr_blocks,
            nr_quantiles=a.nr_quantiles,
            nr_critics=a.nr_critics,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def setup_states(self):
        a = self.config.algorithm
        self.q_update_steps = a.updates_per_step
        self.std_multiplier = a.std_multiplier
        self.use_optimism = a.use_optimistic_exploration
        self.pessimism = a.pessimism
        self.kl_target = a.kl_target
        self.first_reset_step = max(int(a.first_reset_step) // self.nr_envs, 1)
        self.reset_interval = max(int(a.reset_interval) // self.nr_envs, 1)
        states = super().setup_states()

        self.optimistic_policy = BroDualPolicy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            nr_blocks=a.policy_nr_blocks,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )
        self.optimism = Adjustment(a.init_optimism)
        self.regularizer = Adjustment(a.init_regularizer)

        self.key, opt_policy_key, optimism_key, regularizer_key = jax.random.split(self.key, 4)
        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_act = jnp.zeros((1, self.action_dim), jnp.float32)
        adjust_tx = optax.adam(learning_rate=a.adjustment_learning_rate, b1=0.5)
        states["optimistic_policy"] = TrainState.create(
            apply_fn=self.optimistic_policy.apply,
            params=self.optimistic_policy.init(
                opt_policy_key, dummy_obs, dummy_act, dummy_act, self.std_multiplier
            ),
            tx=optax.adam(learning_rate=self.learning_rate),
        )
        states["optimism"] = TrainState.create(
            apply_fn=self.optimism.apply,
            params=self.optimism.init(optimism_key),
            tx=adjust_tx,
        )
        states["regularizer"] = TrainState.create(
            apply_fn=self.regularizer.apply,
            params=self.regularizer.init(regularizer_key),
            tx=adjust_tx,
        )
        # stored fresh init for periodic plasticity resets
        states["init_copy"] = {
            "policy": states["policy"].params,
            "critic": states["critic"].params,
            "optimistic_policy": states["optimistic_policy"].params,
        }
        return states

    def act(self, states, observation, key, step):
        mean, log_std = self.policy.apply(states["policy"].params, observation)
        std = jnp.exp(log_std)
        if self.use_optimism:
            mean, std = self.optimistic_policy.apply(
                states["optimistic_policy"].params, observation, mean, std, self.std_multiplier
            )
        return jnp.tanh(mean + std * jax.random.normal(key, mean.shape))

    def _aggregate(self, z, spread_coeff):
        """Twin quantile stacks [2, B, q] -> [B, q]: mean + coeff * spread/2
        (`bro/flax/bro.py:180,215` with coeff=-pessimism; `:236` with
        coeff=+optimism for the upper bound)."""
        return z.mean(axis=0) + spread_coeff * jnp.abs(z[0] - z[1]) / 2.0

    def _critic_update(self, states, batch, key):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key = key

        next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
            target_key, *self.policy.apply(policy_state.params, batch["next_observation"])
        )
        alpha = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))
        next_z = self.critic.apply(
            critic_state.target_params, batch["next_observation"], next_action
        )  # [n, B, q]
        agg = self._aggregate(next_z, -self.pessimism)
        y = batch["reward"][:, None] + self.gamma * (1.0 - batch["terminated"][:, None]) * (
            agg - alpha * next_log_prob[:, None]
        )
        y = stop_gradient(y)

        def loss_fn(critic_params):
            z = self.critic.apply(critic_params, batch["observation"], batch["action"])
            return quantile_huber_loss(z, y, self.taus), z.mean()

        (q_loss, q_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(critic_state.params)
        critic_state = critic_state.apply_gradients(grads=grads)
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            )
        )
        return {**states, "critic": critic_state}, {
            "loss/q_loss": q_loss, "q_value/q_value": q_mean,
            "gradients/critic_grad_norm": optax.global_norm(grads),
        }

    def _policy_alpha_update(self, states, batch, key):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        current_key, optimistic_key = jax.random.split(key)

        def loss_fn(policy_params, alpha_params):
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            alpha = stop_gradient(alpha_with_grad)
            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            z_pi = self.critic.apply(
                stop_gradient(critic_state.params), batch["observation"], current_action
            )
            q_pi = self._aggregate(z_pi, -self.pessimism).mean(axis=-1)
            policy_loss = (alpha * current_log_prob - q_pi).mean()
            alpha_loss = (alpha_with_grad * (entropy - self.target_entropy)).mean()
            return policy_loss + alpha_loss, {
                "loss/policy_loss": policy_loss,
                "loss/entropy_loss": alpha_loss,
                "entropy/entropy": entropy.mean(),
                "entropy/alpha": alpha,
            }

        (_, metrics), (policy_grads, alpha_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(policy_state.params, alpha_state.params)
        policy_state = policy_state.apply_gradients(grads=policy_grads)
        alpha_state = alpha_state.apply_gradients(grads=alpha_grads)
        metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
        states = {**states, "policy": policy_state, "alpha": alpha_state}

        if self.use_optimism:
            states, optimism_metrics = self._optimistic_update(states, batch, optimistic_key)
            metrics.update(optimism_metrics)
        return states, metrics

    def _optimistic_update(self, states, batch, key):
        """Optimistic-actor + dual-variable updates (`bro/flax/bro.py:225-268`)."""
        critic_params = states["critic"].params
        pessimistic_mean, pessimistic_log_std = self.policy.apply(
            states["policy"].params, batch["observation"]
        )
        pessimistic_mean = stop_gradient(pessimistic_mean)
        pessimistic_std = stop_gradient(jnp.exp(pessimistic_log_std))
        optimism = stop_gradient(self.optimism.apply(states["optimism"].params))
        regularizer = stop_gradient(self.regularizer.apply(states["regularizer"].params))

        def optimistic_loss_fn(params):
            opt_mean, opt_std = self.optimistic_policy.apply(
                params, batch["observation"], pessimistic_mean, pessimistic_std,
                self.std_multiplier,
            )
            action = jnp.tanh(opt_mean + opt_std * jax.random.normal(key, opt_mean.shape))
            z = self.critic.apply(critic_params, batch["observation"], action)
            q_ub = self._aggregate(z, optimism).mean(axis=-1)
            effective_std = opt_std / self.std_multiplier
            kl = (
                jnp.log(pessimistic_std / effective_std)
                + (effective_std**2 + (opt_mean - pessimistic_mean) ** 2)
                / (2.0 * pessimistic_std**2)
                - 0.5
            ).sum(axis=-1)
            return (-q_ub).mean() + regularizer * kl.mean(), kl.mean()

        (opt_loss, kl_mean), grads = jax.value_and_grad(optimistic_loss_fn, has_aux=True)(
            states["optimistic_policy"].params
        )
        optimistic_policy_state = states["optimistic_policy"].apply_gradients(grads=grads)

        empirical_kl = kl_mean / self.action_dim

        def optimism_loss_fn(params):
            value = self.optimism.apply(params)
            return (value - self.pessimism) * (stop_gradient(empirical_kl) - self.kl_target), value

        (_, optimism_value), optimism_grads = jax.value_and_grad(
            optimism_loss_fn, has_aux=True
        )(states["optimism"].params)
        optimism_state = states["optimism"].apply_gradients(grads=optimism_grads)

        def regularizer_loss_fn(params):
            value = self.regularizer.apply(params)
            return -value * (stop_gradient(empirical_kl) - self.kl_target), value

        (_, regularizer_value), regularizer_grads = jax.value_and_grad(
            regularizer_loss_fn, has_aux=True
        )(states["regularizer"].params)
        regularizer_state = states["regularizer"].apply_gradients(grads=regularizer_grads)

        return {
            **states,
            "optimistic_policy": optimistic_policy_state,
            "optimism": optimism_state,
            "regularizer": regularizer_state,
        }, {
            "loss/optimistic_policy_loss": opt_loss,
            "optimism/value": optimism_value,
            "regularizer/value": regularizer_value,
            "kl/empirical_kl": empirical_kl,
        }

    def update_with_buffer(self, states, buffer, key, step):
        states, metrics = super().update_with_buffer(states, buffer, key, step)
        # periodic plasticity reset to the stored init (approximates BRO's
        # full re-initialization)
        past_first = step >= self.first_reset_step
        do_reset = past_first & (((step - self.first_reset_step) % self.reset_interval) == 0)
        for name in ("policy", "critic", "optimistic_policy"):
            state = states[name]
            reset_params = jax.tree.map(
                lambda init, cur: jnp.where(do_reset, init, cur),
                states["init_copy"][name], state.params,
            )
            states[name] = state.replace(params=reset_params)
        metrics["bro/reset"] = do_reset.astype(jnp.float32)
        return states, metrics

    def general_properties():
        return GeneralProperties
