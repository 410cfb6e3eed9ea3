"""TQC: truncated quantile critics.

Parity with `rl_x/algorithms/tqc/flax/tqc.py`: 2 critic nets x 25 quantile
atoms; the target pools all target-net atoms, sorts, and drops the top
``nr_dropped_atoms_per_net`` per net; critic loss is the quantile Huber
against the kept atoms; the policy maximizes the mean over all atoms minus
the entropy term.  Built on the SAC fused program (same alpha machinery).
"""

import jax
import jax.numpy as jnp
import optax
from jax.lax import stop_gradient

from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.algorithms.tqc.tpu.general_properties import GeneralProperties
from rlx_tpu.models import distributions as D
from rlx_tpu.models.mlp import VectorQCritic


def quantile_huber_loss(pred, target, taus, kappa=1.0):
    """pred [n, B, m] atoms, target [B, k] atoms, taus [m] -> scalar."""
    u = target[None, :, None, :] - pred[..., None]          # [n, B, m, k]
    abs_u = jnp.abs(u)
    huber = jnp.where(abs_u <= kappa, 0.5 * u**2, kappa * (abs_u - 0.5 * kappa))
    weight = jnp.abs(taus[None, None, :, None] - (u < 0.0).astype(jnp.float32))
    return (weight * huber).mean()


class TQC(SAC):
    def setup_states(self):
        a = self.config.algorithm
        self.nr_atoms = a.nr_atoms_per_net
        self.nr_dropped = a.nr_dropped_atoms_per_net
        self.taus = (2.0 * jnp.arange(self.nr_atoms) + 1.0) / (2.0 * self.nr_atoms)
        states = super().setup_states()
        return states

    # override the critic to emit quantile atoms
    def _build_critic(self, a):
        return VectorQCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=a.nr_critics,
            activation=a.activation,
            layer_norm=a.layer_norm,
            output_dim=a.nr_atoms_per_net,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def update(self, states, batch, key, step):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key, current_key = jax.random.split(key)

        next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
            target_key, *self.policy.apply(policy_state.params, batch["next_observation"])
        )
        alpha_stopped = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))

        next_z = self.critic.apply(
            critic_state.target_params, batch["next_observation"], next_action
        )  # [n, B, atoms]
        n, B, m = next_z.shape
        pooled = jnp.sort(jnp.transpose(next_z, (1, 0, 2)).reshape(B, n * m), axis=-1)
        kept = pooled[:, : n * m - n * self.nr_dropped]  # drop top atoms
        y = batch["reward"][:, None] + self.gamma * (1.0 - batch["terminated"][:, None]) * (
            kept - alpha_stopped * next_log_prob[:, None]
        )
        y = stop_gradient(y)

        def critic_loss_fn(critic_params):
            z = self.critic.apply(critic_params, batch["observation"], batch["action"])
            return quantile_huber_loss(z, y, self.taus), z.mean()

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
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            z_pi = self.critic.apply(
                stop_gradient(critic_state.params), batch["observation"], current_action
            )
            policy_loss = (alpha * current_log_prob - z_pi.mean(axis=(0, 2))).mean()
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
