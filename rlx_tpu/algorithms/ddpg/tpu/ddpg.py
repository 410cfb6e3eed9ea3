"""DDPG as one fused XLA program.

Parity with `rl_x/algorithms/ddpg/flax/ddpg.py`: deterministic tanh policy
with exploration noise, single Q critic, polyak policy/critic targets
updated every step.
"""

import jax
import jax.numpy as jnp
import optax
from jax.lax import stop_gradient

from rlx_tpu.algorithms.ddpg.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.offpolicy import OffPolicyAlgorithm
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models.mlp import DeterministicTanhPolicy, QCritic


class DDPG(OffPolicyAlgorithm):
    def setup_states(self):
        a = self.config.algorithm
        self.key, policy_key, critic_key = jax.random.split(self.key, 3)
        self.epsilon = a.epsilon

        self.policy = DeterministicTanhPolicy(
            action_dim=self.action_dim,
            hidden_sizes=tuple(a.policy_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )
        self.critic = QCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((1, self.action_dim), jnp.float32)
        return {
            "policy": RLTrainState.create(
                apply_fn=self.policy.apply,
                params=self.policy.init(policy_key, dummy_obs),
                target_params=self.policy.init(policy_key, dummy_obs),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate),
            ),
            "critic": RLTrainState.create(
                apply_fn=self.critic.apply,
                params=self.critic.init(critic_key, dummy_obs, dummy_action),
                target_params=self.critic.init(critic_key, dummy_obs, dummy_action),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate),
            ),
        }

    def act(self, states, observation, key, step):
        action = self.policy.apply(states["policy"].params, observation)
        noise = self.epsilon * jax.random.normal(key, action.shape)
        return jnp.clip(action + noise, -1.0, 1.0)

    def eval_act(self, states, observation):
        return self.policy.apply(states["policy"].params, observation)

    def update(self, states, batch, key, step):
        policy_state, critic_state = states["policy"], states["critic"]

        def critic_loss_fn(critic_params):
            next_action = self.policy.apply(policy_state.target_params, batch["next_observation"])
            next_q = self.critic.apply(
                critic_state.target_params, batch["next_observation"], next_action
            ).squeeze(-1)
            y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * next_q
            q = self.critic.apply(critic_params, batch["observation"], batch["action"]).squeeze(-1)
            return ((q - stop_gradient(y)) ** 2).mean(), q.mean()

        (q_loss, q_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            critic_state.params
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)

        def policy_loss_fn(policy_params):
            action = self.policy.apply(policy_params, batch["observation"])
            q = self.critic.apply(stop_gradient(critic_state.params), batch["observation"], action)
            return -q.mean()

        policy_loss, policy_grads = jax.value_and_grad(policy_loss_fn)(policy_state.params)
        policy_state = policy_state.apply_gradients(grads=policy_grads)

        policy_state = policy_state.replace(
            target_params=optax.incremental_update(
                policy_state.params, policy_state.target_params, self.tau
            )
        )
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            )
        )

        metrics = {
            "loss/q_loss": q_loss,
            "loss/policy_loss": policy_loss,
            "q_value/q_value": q_mean,
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return {"policy": policy_state, "critic": critic_state}, metrics

    def general_properties():
        return GeneralProperties
