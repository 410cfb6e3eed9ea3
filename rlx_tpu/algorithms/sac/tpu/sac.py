"""SAC as ONE fused XLA program with an on-device sharded replay buffer.

Parity with `rl_x/algorithms/sac/flax_full_jit/sac.py:129-391`: whole
off-policy run in one jit — prefill scan, 1-env-step-1-update hot loop,
in-jit uniform replay sampling, twin-Q min target, auto-tuned alpha
(`sac/flax_full_jit/entropy_coefficient.py:5-11`), polyak target updates
via optax.incremental_update (`sac.py:297`), logging/eval/save cadence
scans.  Scaffolding lives in rlx_tpu.algorithms.offpolicy (TPU redesign:
the reference duplicates it per directory); this file is just the SAC math.

Batched loss == the reference's vmap-then-tree-mean (`sac.py:272-275`);
tanh log-prob uses the numerically stable softplus form of log(1-tanh^2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.offpolicy import OffPolicyAlgorithm
from rlx_tpu.algorithms.sac.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models import distributions as D
from rlx_tpu.models.mlp import EntropyCoefficient, SquashedGaussianPolicy, VectorQCritic


class SAC(OffPolicyAlgorithm):
    def _build_critic(self, a):
        """Overridable: TQC swaps in quantile heads, DroQ adds dropout."""
        return VectorQCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=a.nr_critics,
            activation=a.activation,
            layer_norm=a.layer_norm,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
            dropout_rate=getattr(a, "dropout_rate", 0.0),
        )

    def _build_policy(self, a):
        """Overridable: SimBa/BRO/SimbaV2 swap in residual/hypersphere trunks."""
        return SquashedGaussianPolicy(
            action_dim=self.action_dim,
            hidden_sizes=tuple(a.policy_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            log_std_min=a.log_std_min,
            log_std_max=a.log_std_max,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def setup_states(self):
        a = self.config.algorithm
        self.key, policy_key, critic_key, alpha_key = jax.random.split(self.key, 4)

        self.policy = self._build_policy(a)
        self.critic = self._build_critic(a)
        self.entropy_coefficient = EntropyCoefficient(1.0)

        if a.target_entropy == "auto":
            self.target_entropy = -float(self.action_dim)
        else:
            self.target_entropy = float(a.target_entropy)

        def linear_schedule(count):
            step = (count * self.nr_envs) - self.learning_starts
            fraction = 1.0 - step / max(self.total_training_timesteps, 1)
            return self.learning_rate * fraction

        lr = linear_schedule if a.anneal_learning_rate else self.learning_rate

        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((1, self.action_dim), jnp.float32)
        return {
            "policy": TrainState.create(
                apply_fn=self.policy.apply,
                params=self.policy.init(policy_key, dummy_obs),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr),
            ),
            "critic": RLTrainState.create(
                apply_fn=self.critic.apply,
                params=self.critic.init(critic_key, dummy_obs, dummy_action),
                target_params=self.critic.init(critic_key, dummy_obs, dummy_action),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr),
            ),
            "alpha": TrainState.create(
                apply_fn=self.entropy_coefficient.apply,
                params=self.entropy_coefficient.init(alpha_key),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr),
            ),
        }

    def act(self, states, observation, key, step):
        mean, log_std = self.policy.apply(states["policy"].params, observation)
        return jnp.tanh(mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape))

    def eval_act(self, states, observation):
        mean, _ = self.policy.apply(states["policy"].params, observation)
        return jnp.tanh(mean)

    def update(self, states, batch, key, step):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key, current_key = jax.random.split(key)

        def loss_fn(policy_params, critic_params, alpha_params):
            next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
                target_key, *self.policy.apply(stop_gradient(policy_params), batch["next_observation"])
            )
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            alpha = stop_gradient(alpha_with_grad)

            next_q_target = self.critic.apply(
                critic_state.target_params, batch["next_observation"], next_action
            ).squeeze(-1)
            min_next_q_target = jnp.min(next_q_target, axis=0)

            y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * (
                min_next_q_target - alpha * next_log_prob
            )

            q = self.critic.apply(critic_params, batch["observation"], batch["action"]).squeeze(-1)
            q_loss = ((q - y[None, :]) ** 2).mean()

            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            q_pi = self.critic.apply(
                stop_gradient(critic_params), batch["observation"], current_action
            ).squeeze(-1)
            min_q_pi = jnp.min(q_pi, axis=0)
            policy_loss = (alpha * current_log_prob - min_q_pi).mean()

            alpha_loss = (alpha_with_grad * (entropy - self.target_entropy)).mean()

            loss = q_loss + policy_loss + alpha_loss
            metrics = {
                "loss/q_loss": q_loss,
                "loss/policy_loss": policy_loss,
                "loss/entropy_loss": alpha_loss,
                "entropy/entropy": entropy.mean(),
                "entropy/alpha": alpha,
                "q_value/q_value": min_q_pi.mean(),
            }
            return loss, metrics

        grad_loss_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (_, metrics), (policy_grads, critic_grads, alpha_grads) = grad_loss_fn(
            policy_state.params, critic_state.params, alpha_state.params
        )

        policy_state = policy_state.apply_gradients(grads=policy_grads)
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        alpha_state = alpha_state.apply_gradients(grads=alpha_grads)
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            )
        )

        metrics["lr/learning_rate"] = policy_state.opt_state.hyperparams["learning_rate"]
        metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
        metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
        metrics["gradients/entropy_grad_norm"] = optax.global_norm(alpha_grads)
        return {**states, "policy": policy_state, "critic": critic_state, "alpha": alpha_state}, metrics

    def general_properties():
        return GeneralProperties


# Backwards-compatible attribute views used by tests and notebooks.
def _state_property(name):
    def getter(self):
        return self.states[name]

    def setter(self, value):
        self.states[name] = value

    return property(getter, setter)


SAC.policy_state = _state_property("policy")
SAC.critic_state = _state_property("critic")
SAC.entropy_coefficient_state = _state_property("alpha")
