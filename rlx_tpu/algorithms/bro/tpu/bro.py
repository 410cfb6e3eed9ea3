"""BRO: bigger, regularized, optimistic.

Parity with `rl_x/algorithms/bro/flax/bro.py` on the main levers: BroNet
residual trunks (`bro/flax/layers.py`), twin quantile critics (100
quantiles, quantile-Huber loss), high UTD (``updates_per_step``), periodic
full parameter resets (``first_reset_step`` / ``reset_interval`` — BRO's
plasticity trick, realized in-jit by select-restoring the stored initial
parameters), and optimistic exploration approximated by scaling the policy
stddev with ``std_multiplier`` at act time (the reference trains a separate
optimistic policy head; the dual-network optimism machinery is simplified
here and noted as such).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from jax.lax import stop_gradient

from rlx_tpu.algorithms.bro.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.algorithms.sac_ensembles import EnsembleSAC
from rlx_tpu.algorithms.tqc.tpu.tqc import quantile_huber_loss
from rlx_tpu.models import distributions as D
from rlx_tpu.models.layers import BroNetEncoder
from rlx_tpu.ops import replay_buffer as rb
from rlx_tpu.parallel import mesh as mesh_lib


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
        self.first_reset_step = max(int(a.first_reset_step) // self.nr_envs, 1)
        self.reset_interval = max(int(a.reset_interval) // self.nr_envs, 1)
        states = super().setup_states()
        # stored fresh init for periodic plasticity resets
        states["init_copy"] = {
            "policy": states["policy"].params,
            "critic": states["critic"].params,
        }
        return states

    def act(self, states, observation, key, step):
        mean, log_std = self.policy.apply(states["policy"].params, observation)
        std = jnp.exp(log_std) * (self.std_multiplier if self.use_optimism else 1.0)
        return jnp.tanh(mean + std * jax.random.normal(key, mean.shape))

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
        pooled = jnp.sort(
            jnp.transpose(next_z, (1, 0, 2)).reshape(next_z.shape[1], -1), axis=-1
        )
        y = batch["reward"][:, None] + self.gamma * (1.0 - batch["terminated"][:, None]) * (
            pooled - alpha * next_log_prob[:, None]
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

    def policy_q_aggregate(self, q_pi):
        # q_pi here is [n, B, quantiles] -> mean over nets and quantiles
        return q_pi.mean(axis=(0, -1)) if q_pi.ndim == 3 else q_pi.mean(axis=0)

    def _policy_alpha_update(self, states, batch, key):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        current_key = key

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
            policy_loss = (alpha * current_log_prob - z_pi.mean(axis=(0, -1))).mean()
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
        return {**states, "policy": policy_state, "alpha": alpha_state}, metrics

    def update_with_buffer(self, states, buffer, key, step):
        states, metrics = super().update_with_buffer(states, buffer, key, step)
        # periodic plasticity reset to the stored init (approximates BRO's
        # full re-initialization)
        past_first = step >= self.first_reset_step
        do_reset = past_first & (((step - self.first_reset_step) % self.reset_interval) == 0)
        for name in ("policy", "critic"):
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
