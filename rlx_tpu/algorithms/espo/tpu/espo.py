"""ESPO: early-stopping policy optimization.

Parity with `rl_x/algorithms/espo/flax/espo.py:148-235`: PPO-style epochs
over the whole batch, stopped early once the mean (or median) of
``|ratio - 1|`` exceeds ``max_ratio_delta``.  The reference stops a host
epoch loop; inside the fused program the stop is branchless — an ``active``
flag gates whether each epoch's update is applied.
"""

import jax
import jax.numpy as jnp
import optax

from rlx_tpu.algorithms.espo.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.ppo.tpu.ppo import PPO


class ESPO(PPO):
    def __init__(self, config, train_env, eval_env, run_path, writer):
        super().__init__(config, train_env, eval_env, run_path, writer)
        self.max_ratio_delta = config.algorithm.max_ratio_delta
        self.delta_calc_operator = (
            jnp.mean if config.algorithm.delta_calc_operator == "mean" else jnp.median
        )

    def _optimize(self, policy_state, critic_state, batch_arrays, key):
        batch_observations, batch_actions, batch_log_probs, batch_returns, batch_advantages = batch_arrays
        advantages = (batch_advantages - batch_advantages.mean()) / (batch_advantages.std() + 1e-8)

        def loss_fn(policy_params, critic_params):
            new_log_prob, entropy = self.policy.log_prob_entropy(
                policy_params, batch_observations, batch_actions
            )
            ratio = jnp.exp(new_log_prob - batch_log_probs)
            ratio_delta = self.delta_calc_operator(jnp.abs(ratio - 1.0))

            pg_loss = jnp.maximum(
                -advantages * ratio,
                -advantages * jnp.clip(ratio, 1.0 - self.clip_range, 1.0 + self.clip_range),
            ).mean()
            entropy_loss = entropy.mean()
            new_value = self.critic.apply(critic_params, batch_observations).squeeze(-1)
            critic_loss = (0.5 * (new_value - batch_returns) ** 2).mean()
            loss = pg_loss - self.entropy_coef * entropy_loss + self.critic_coef * critic_loss
            metrics = {
                "loss/policy_gradient_loss": pg_loss,
                "loss/critic_loss": critic_loss,
                "loss/entropy_loss": entropy_loss,
                "policy_ratio/ratio_delta": ratio_delta,
            }
            return loss, (metrics, ratio_delta)

        grad_loss_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        def epoch_update(carry, _):
            policy_state, critic_state, active = carry
            (_, (metrics, ratio_delta)), (policy_grads, critic_grads) = grad_loss_fn(
                policy_state.params, critic_state.params
            )
            updated_policy = policy_state.apply_gradients(grads=policy_grads)
            updated_critic = critic_state.apply_gradients(grads=critic_grads)
            select = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new, old
            )
            policy_state = select(updated_policy, policy_state)
            critic_state = select(updated_critic, critic_state)
            metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
            metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
            metrics["policy_ratio/nr_active_epochs"] = active.astype(jnp.float32)
            # stop all FOLLOWING epochs once the ratio deviated too far
            active = active & (ratio_delta <= self.max_ratio_delta)
            return (policy_state, critic_state, active), metrics

        (policy_state, critic_state, _), metrics = jax.lax.scan(
            epoch_update, (policy_state, critic_state, jnp.asarray(True)), None, self.nr_epochs
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["policy_ratio/nr_active_epochs"] = metrics["policy_ratio/nr_active_epochs"] * self.nr_epochs
        metrics["lr/learning_rate"] = policy_state.opt_state[1].hyperparams["learning_rate"]
        return policy_state, critic_state, metrics

    def general_properties():
        return GeneralProperties
