"""FastSAC: SAC with the FastTD3 recipe.

Parity with `rl_x/algorithms/fastsac/flax_full_jit/fastsac.py`: twin
categorical critics over a fixed support (101 atoms) trained by
cross-entropy against the projected target distribution, n-step returns,
running observation normalizer — on top of SAC's tanh-Gaussian policy and
auto-tuned alpha.
"""

import jax
import jax.numpy as jnp
import optax
from jax.lax import stop_gradient

from rlx_tpu.algorithms.fastsac.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.models import distributions as D
from rlx_tpu.models.mlp import VectorQCritic
from rlx_tpu.ops import normalizers
from rlx_tpu.ops.distributional import categorical_projection_dense as categorical_projection


class FastSAC(SAC):
    def _build_critic(self, a):
        self.v_min, self.v_max = a.v_min, a.v_max
        self.nr_atoms = a.nr_atoms
        self.atoms = jnp.linspace(self.v_min, self.v_max, self.nr_atoms)
        self.normalize_obs = a.enable_observation_normalization
        return VectorQCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=a.nr_critics,
            activation=a.activation,
            layer_norm=a.layer_norm,
            output_dim=a.nr_atoms,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def setup_states(self):
        states = super().setup_states()
        states["obs_normalizer"] = normalizers.obs_normalizer_init(self.os_shape)
        return states

    def _norm(self, states, observation):
        if self.normalize_obs:
            return normalizers.obs_normalize(states["obs_normalizer"], observation)
        return observation

    def observe_transition(self, states, observation, env_state):
        if not self.normalize_obs:
            return states
        return {**states, "obs_normalizer": normalizers.obs_normalizer_update(
            states["obs_normalizer"], observation)}

    def act(self, states, observation, key, step):
        return super().act(states, self._norm(states, observation), key, step)

    def eval_act(self, states, observation):
        return super().eval_act(states, self._norm(states, observation))

    def expected_value(self, logits):
        return (jax.nn.softmax(logits, axis=-1) * self.atoms).sum(-1)

    def update(self, states, batch, key, step):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key, current_key = jax.random.split(key)

        obs = self._norm(states, batch["observation"])
        next_obs = self._norm(states, batch["n_step_next_observation" if self.n_step > 1 else "next_observation"])
        reward = batch["n_step_reward"] if self.n_step > 1 else batch["reward"]
        terminated = batch["n_step_terminated"] if self.n_step > 1 else batch["terminated"]
        discount = batch["n_step_gamma"] if self.n_step > 1 else jnp.full_like(reward, self.gamma)

        next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
            target_key, *self.policy.apply(policy_state.params, next_obs)
        )
        alpha_stopped = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))

        next_logits = self.critic.apply(critic_state.target_params, next_obs, next_action)
        next_probs = jax.nn.softmax(next_logits, axis=-1)
        expected = (next_probs * self.atoms).sum(-1)  # [2, B]
        lower = jnp.argmin(expected, axis=0)
        chosen_probs = jnp.where(lower[:, None] == 0, next_probs[0], next_probs[1])

        # entropy bonus shifts the support before projection
        target_z = reward[:, None] + discount[:, None] * (1.0 - terminated[:, None]) * (
            self.atoms[None] - alpha_stopped * next_log_prob[:, None]
        )
        target_dist = stop_gradient(
            categorical_projection(target_z, chosen_probs, self.v_min, self.v_max, self.nr_atoms)
        )

        def critic_loss_fn(critic_params):
            logits = self.critic.apply(critic_params, obs, batch["action"])
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            loss = -(target_dist[None] * log_probs).sum(-1).mean()
            return loss, self.expected_value(logits).mean()

        (q_loss, q_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            critic_state.params
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            )
        )

        def policy_loss_fn(policy_params, alpha_params):
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            alpha = stop_gradient(alpha_with_grad)
            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, obs)
            )
            entropy = stop_gradient(-current_log_prob)
            logits = self.critic.apply(stop_gradient(critic_state.params), obs, current_action)
            q_pi = self.expected_value(logits).min(axis=0)
            policy_loss = (alpha * current_log_prob - q_pi).mean()
            alpha_loss = (alpha_with_grad * (entropy - self.target_entropy)).mean()
            return policy_loss + alpha_loss, (policy_loss, alpha_loss, entropy.mean(), alpha)

        (_, (policy_loss, alpha_loss, entropy_mean, alpha)), (policy_grads, alpha_grads) = (
            jax.value_and_grad(policy_loss_fn, argnums=(0, 1), has_aux=True)(
                policy_state.params, alpha_state.params
            )
        )
        policy_state = policy_state.apply_gradients(grads=policy_grads)
        alpha_state = alpha_state.apply_gradients(grads=alpha_grads)

        metrics = {
            "loss/q_loss": q_loss,
            "loss/policy_loss": policy_loss,
            "loss/entropy_loss": alpha_loss,
            "entropy/entropy": entropy_mean,
            "entropy/alpha": alpha,
            "q_value/q_value": q_mean,
            "lr/learning_rate": policy_state.opt_state.hyperparams["learning_rate"],
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return {**states, "policy": policy_state, "critic": critic_state, "alpha": alpha_state}, metrics

    def general_properties():
        return GeneralProperties
