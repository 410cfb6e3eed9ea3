"""XQC: cross-entropy Q-learning with categorical (HL-Gauss) critics.

Parity with `rl_x/algorithms/xqc/flax/xqc.py` (`default_config.py:19-35`):
twin categorical critics (101 atoms over [-5, 5]) with residual-block
trunks trained by cross-entropy against Gaussian-smeared scalar targets,
residual-block policy, policy delay 3, reward normalization, and the
weight-norm parameterization (`xqc/flax/layers.py:38-61`,
`xqc/flax/xqc.py:117-120,251-252,296-298`): hidden Dense kernels+biases
are projected back to unit input-norm after init and after every gradient
step; predictor heads (mean/log_std/value) kernel-only when
``normalize_last_layer``.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from jax.lax import stop_gradient

from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.algorithms.xqc.tpu.general_properties import GeneralProperties
from rlx_tpu.models import distributions as D
from rlx_tpu.models.layers import SimbaEncoder
from rlx_tpu.models.weight_norm import weight_norm_params
from rlx_tpu.ops.distributional import hl_gauss_expectation, hl_gauss_targets


class XQCPolicy(nn.Module):
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
        x = SimbaEncoder(self.hidden_dim, self.nr_blocks)(x)
        mean = nn.Dense(self.action_dim, name="mean")(x)
        log_std = nn.Dense(self.action_dim, name="log_std")(x)
        log_std = self.log_std_min + (self.log_std_max - self.log_std_min) * 0.5 * (
            1.0 + jnp.tanh(log_std)
        )
        return mean, log_std


class XQCCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_atoms: int
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        x = SimbaEncoder(self.hidden_dim, self.nr_blocks)(x)
        return nn.Dense(self.nr_atoms, name="value")(x)


class XQCVectorCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_atoms: int
    nr_critics: int = 2
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        ensemble = nn.vmap(
            XQCCritic,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(
            self.hidden_dim, self.nr_blocks, self.nr_atoms, self.observation_indices
        )(obs, action)


class XQC(SAC):
    def setup_states(self):
        a = self.config.algorithm
        self.use_weight_norm = a.use_weight_norm
        self.normalize_last_layer = a.normalize_last_layer
        states = super().setup_states()
        if self.use_weight_norm:
            for name in ("policy", "critic"):
                states[name] = states[name].replace(
                    params=self._weight_norm(states[name].params)
                )
            states["critic"] = states["critic"].replace(
                target_params=self._weight_norm(states["critic"].target_params)
            )
        return states

    def _weight_norm(self, params):
        if not self.use_weight_norm:
            return params
        return weight_norm_params(params, normalize_last_layer=self.normalize_last_layer)

    def _build_policy(self, a):
        self.policy_delay = a.policy_delay
        return XQCPolicy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            nr_blocks=a.policy_nr_blocks,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def _build_critic(self, a):
        self.v_min, self.v_max = a.v_min, a.v_max
        self.nr_atoms = a.nr_atoms
        return XQCVectorCritic(
            hidden_dim=a.critic_hidden_dim,
            nr_blocks=a.critic_nr_blocks,
            nr_atoms=a.nr_atoms,
            nr_critics=a.nr_critics,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def update(self, states, batch, key, step):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key, current_key = jax.random.split(key)

        next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
            target_key, *self.policy.apply(policy_state.params, batch["next_observation"])
        )
        alpha = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))
        next_logits = self.critic.apply(
            critic_state.target_params, batch["next_observation"], next_action
        )
        next_q = hl_gauss_expectation(next_logits, self.v_min, self.v_max)  # [n, B]
        y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * (
            jnp.min(next_q, axis=0) - alpha * next_log_prob
        )
        target_dist = stop_gradient(
            hl_gauss_targets(jnp.clip(y, self.v_min, self.v_max), self.v_min, self.v_max, self.nr_atoms)
        )

        def critic_loss_fn(critic_params):
            logits = self.critic.apply(critic_params, batch["observation"], batch["action"])
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            loss = -(target_dist[None] * log_probs).sum(-1).mean()
            return loss, hl_gauss_expectation(logits, self.v_min, self.v_max).mean()

        (q_loss, q_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            critic_state.params
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        critic_state = critic_state.replace(params=self._weight_norm(critic_state.params))
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            )
        )

        def policy_loss_fn(policy_params, alpha_params):
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            alpha_s = stop_gradient(alpha_with_grad)
            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            logits = self.critic.apply(
                stop_gradient(critic_state.params), batch["observation"], current_action
            )
            q_pi = hl_gauss_expectation(logits, self.v_min, self.v_max).min(axis=0)
            policy_loss = (alpha_s * current_log_prob - q_pi).mean()
            alpha_loss = (alpha_with_grad * (entropy - self.target_entropy)).mean()
            return policy_loss + alpha_loss, (policy_loss, alpha_loss, entropy.mean(), alpha_s)

        (_, (policy_loss, alpha_loss, entropy_mean, alpha_val)), (policy_grads, alpha_grads) = (
            jax.value_and_grad(policy_loss_fn, argnums=(0, 1), has_aux=True)(
                policy_state.params, alpha_state.params
            )
        )
        updated_policy = policy_state.apply_gradients(grads=policy_grads)
        updated_policy = updated_policy.replace(params=self._weight_norm(updated_policy.params))
        updated_alpha = alpha_state.apply_gradients(grads=alpha_grads)
        do_update = (step % self.policy_delay) == 0
        select = lambda new, old: jax.tree.map(lambda n, o: jnp.where(do_update, n, o), new, old)
        policy_state = select(updated_policy, policy_state.replace(step=policy_state.step + 1))
        alpha_state = select(updated_alpha, alpha_state)

        metrics = {
            "loss/q_loss": q_loss,
            "loss/policy_loss": policy_loss,
            "loss/entropy_loss": alpha_loss,
            "entropy/entropy": entropy_mean,
            "entropy/alpha": alpha_val,
            "q_value/q_value": q_mean,
            "lr/learning_rate": policy_state.opt_state.hyperparams["learning_rate"],
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return {**states, "policy": policy_state, "critic": critic_state, "alpha": alpha_state}, metrics

    def general_properties():
        return GeneralProperties
