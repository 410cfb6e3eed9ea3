"""Shared machinery for SAC-family ensemble critics with high UTD ratios.

Covers the reference's REDQ (`rl_x/algorithms/redq/flax/redq.py`: ensemble
10, random 2-subset min target, 20 critic updates per env step), DroQ
(`droq/flax/droq.py`: 2 dropout+LayerNorm critics, UTD 20) and AQE
(`aqe/flax/aqe.py`: ensemble 10, drop the 4 highest Q-values, UTD 5).
Subclasses override the two aggregation hooks and the config-driven critic
construction; the UTD loop is a fused scan drawing a fresh replay batch per
critic step.
"""

import jax
import jax.numpy as jnp
import optax
from jax.lax import stop_gradient

from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.models import distributions as D
from rlx_tpu.ops import replay_buffer as rb
from rlx_tpu.parallel import mesh as mesh_lib


class EnsembleSAC(SAC):
    """SAC with N critics, configurable target/policy Q aggregation, UTD > 1."""

    def target_q_aggregate(self, next_q, key):
        """next_q [n_critics, batch] -> [batch]."""
        return jnp.min(next_q, axis=0)

    def policy_q_aggregate(self, q_pi):
        """q_pi [n_critics, batch] -> [batch]."""
        return jnp.min(q_pi, axis=0)

    def _critic_rngs(self, key):
        if getattr(self.critic, "dropout_rate", 0.0) > 0.0:
            return {"dropout": key}
        return {}

    def _critic_update(self, states, batch, key):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key, subset_key, drop1, drop2 = jax.random.split(key, 4)

        next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
            target_key, *self.policy.apply(policy_state.params, batch["next_observation"])
        )
        alpha = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))
        next_q = self.critic.apply(
            critic_state.target_params, batch["next_observation"], next_action,
            rngs=self._critic_rngs(drop1),
        ).squeeze(-1)
        agg_next_q = self.target_q_aggregate(next_q, subset_key)
        y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * (
            agg_next_q - alpha * next_log_prob
        )

        def loss_fn(critic_params):
            q = self.critic.apply(
                critic_params, batch["observation"], batch["action"],
                rngs=self._critic_rngs(drop2),
            ).squeeze(-1)
            return ((q - stop_gradient(y)[None, :]) ** 2).mean(), q.mean()

        (q_loss, q_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(critic_state.params)
        critic_state = critic_state.apply_gradients(grads=grads)
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            )
        )
        states = {**states, "critic": critic_state}
        return states, {"loss/q_loss": q_loss, "q_value/q_value": q_mean,
                        "gradients/critic_grad_norm": optax.global_norm(grads)}

    def _policy_alpha_update(self, states, batch, key):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        current_key, drop_key = jax.random.split(key)

        def loss_fn(policy_params, alpha_params):
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            alpha = stop_gradient(alpha_with_grad)
            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            q_pi = self.critic.apply(
                stop_gradient(critic_state.params), batch["observation"], current_action,
                rngs=self._critic_rngs(drop_key),
            ).squeeze(-1)
            agg_q = self.policy_q_aggregate(q_pi)
            policy_loss = (alpha * current_log_prob - agg_q).mean()
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
        key, policy_key, policy_sample_key = jax.random.split(key, 3)

        def critic_step(states, step_key):
            sample_key, update_key = jax.random.split(step_key)
            batch = rb.sample(
                buffer, sample_key, self.batch_size,
                shard_local=self.shard_local_sampling, dp_size=self.dp_size,
            )
            batch = mesh_lib.shard_batch(batch, self.mesh)
            return self._critic_update(states, batch, update_key)

        states, critic_metrics = jax.lax.scan(
            critic_step, states, jax.random.split(key, self.q_update_steps)
        )
        critic_metrics = jax.tree.map(jnp.mean, critic_metrics)

        batch = rb.sample(
            buffer, policy_sample_key, self.batch_size,
            shard_local=self.shard_local_sampling, dp_size=self.dp_size,
        )
        batch = mesh_lib.shard_batch(batch, self.mesh)
        states, policy_metrics = self._policy_alpha_update(states, batch, policy_key)
        metrics = {**critic_metrics, **policy_metrics}
        metrics["lr/learning_rate"] = states["policy"].opt_state.hyperparams["learning_rate"]
        return states, metrics
