"""PPO-DTRL: PPO with differentiable trust-region projection layers.

Parity with `rl_x/algorithms/ppo_dtrl/flax/ppo_dtrl.py:143-205`: instead of
(only) ratio clipping, the new Gaussian policy is PROJECTED back into a KL
trust region around the iteration-start policy per state (mean and
covariance bounds separately), the surrogate loss is computed under the
projected distribution, and a trust-region regularization term pulls the
unprojected network output toward the (detached) projection.

Old per-state statistics are recovered by evaluating the frozen
iteration-start parameters inside the loss (identical to the reference's
stored rollout statistics, since both use the same params on the same
observations).
"""

import jax
import jax.numpy as jnp
import optax

from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
from rlx_tpu.algorithms.ppo_dtrl.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.ppo_dtrl.tpu.trust_region import entropy_projection, kl_projection
from rlx_tpu.models import distributions as D


class PPODTRL(PPO):
    def __init__(self, config, train_env, eval_env, run_path, writer):
        super().__init__(config, train_env, eval_env, run_path, writer)
        a = config.algorithm
        self.mean_bound = a.mean_bound
        self.cov_bound = a.cov_bound
        self.trust_region_coef = a.trust_region_coef
        self.entropy_projection_active = a.entropy_projection_active
        self.min_entropy = a.min_entropy

    def _optimize(self, policy_state, critic_state, batch_arrays, key):
        batch_observations, batch_actions, batch_log_probs, batch_returns, batch_advantages = batch_arrays
        old_policy_params = jax.lax.stop_gradient(policy_state.params)

        def loss_fn(policy_params, critic_params, obs_mb, action_mb, log_prob_mb, return_mb, advantage_mb):
            mean, logstd = self.policy.module.apply(policy_params, obs_mb)
            std = jnp.exp(jnp.broadcast_to(logstd, mean.shape))
            old_mean, old_logstd = self.policy.module.apply(old_policy_params, obs_mb)
            old_std = jnp.exp(jnp.broadcast_to(old_logstd, old_mean.shape))

            proj = kl_projection(mean, std, old_mean, old_std, self.mean_bound, self.cov_bound)
            proj_mean, proj_std = proj["mean"], proj["std"]
            proj_logstd = jnp.log(proj_std)
            if self.entropy_projection_active:
                proj_logstd = entropy_projection(proj_logstd, self.min_entropy)
                proj_std = jnp.exp(proj_logstd)

            # regularizer: pull the raw output toward the detached projection
            proj_mean_det = jax.lax.stop_gradient(proj_mean)
            proj_std_det = jax.lax.stop_gradient(proj_std)
            tr_maha = 0.5 * (((proj_mean_det - mean) / proj_std_det) ** 2).sum(-1)
            tr_cov = 0.5 * (
                2.0 * (jnp.log(proj_std_det) - jnp.log(std)) + (std / proj_std_det) ** 2 - 1.0
            ).sum(-1)
            trust_region_loss = (tr_maha + tr_cov).mean()

            new_log_prob = D.gaussian_log_prob(proj_mean, proj_logstd, action_mb)
            entropy = (proj_logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum(-1)

            logratio = new_log_prob - log_prob_mb
            ratio = jnp.exp(logratio)
            approx_kl = ((ratio - 1.0) - logratio).mean()
            clip_fraction = (jnp.abs(ratio - 1.0) > self.clip_range).mean()
            pg_loss1 = -advantage_mb * ratio
            pg_loss2 = -advantage_mb * jnp.clip(ratio, 1.0 - self.clip_range, 1.0 + self.clip_range)
            pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()
            entropy_loss = entropy.mean()

            new_value = self.critic.apply(critic_params, obs_mb).squeeze(-1)
            critic_loss = (0.5 * (new_value - return_mb) ** 2).mean()

            loss = (
                pg_loss
                - self.entropy_coef * entropy_loss
                + self.critic_coef * critic_loss
                + self.trust_region_coef * trust_region_loss
            )
            metrics = {
                "loss/policy_gradient_loss": pg_loss,
                "loss/critic_loss": critic_loss,
                "loss/entropy_loss": entropy_loss,
                "loss/trust_region_loss": trust_region_loss,
                "policy_ratio/approx_kl": approx_kl,
                "policy_ratio/clip_fraction": clip_fraction,
                "projection/eta_cov": proj["eta_cov"].mean(),
                "projection/unprojected_kl_mean": proj["kl_mean_part"].mean(),
                "projection/unprojected_kl_cov": proj["kl_cov_part"].mean(),
                "projection/projected_kl_mean": proj["post_kl_mean_part"].mean(),
                "projection/projected_kl_cov": proj["post_kl_cov_part"].mean(),
            }
            return loss, metrics

        grad_loss_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        key, perm_key = jax.random.split(key)
        batch_indices = jnp.tile(jnp.arange(self.batch_size), (self.nr_epochs, 1))
        batch_indices = jax.random.permutation(perm_key, batch_indices, axis=1, independent=True)
        batch_indices = batch_indices.reshape((self.nr_epochs * self.nr_minibatches, self.minibatch_size))

        def minibatch_update(carry, minibatch_indices):
            policy_state, critic_state = carry
            mb_advantages = batch_advantages[minibatch_indices]
            mb_advantages = (mb_advantages - mb_advantages.mean()) / (mb_advantages.std() + 1e-8)
            (loss, metrics), (policy_grads, critic_grads) = grad_loss_fn(
                policy_state.params, critic_state.params,
                batch_observations[minibatch_indices],
                batch_actions[minibatch_indices],
                batch_log_probs[minibatch_indices],
                batch_returns[minibatch_indices],
                mb_advantages,
            )
            policy_state = policy_state.apply_gradients(grads=policy_grads)
            critic_state = critic_state.apply_gradients(grads=critic_grads)
            metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
            metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
            return (policy_state, critic_state), metrics

        (policy_state, critic_state), metrics = jax.lax.scan(
            minibatch_update, (policy_state, critic_state), batch_indices
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["lr/learning_rate"] = policy_state.opt_state[1].hyperparams["learning_rate"]
        return policy_state, critic_state, metrics

    def general_properties():
        return GeneralProperties
