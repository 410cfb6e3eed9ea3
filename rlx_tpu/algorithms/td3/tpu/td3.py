"""TD3 as one fused XLA program.

Parity with `rl_x/algorithms/td3/flax/td3.py`: deterministic tanh policy
with exploration noise ``epsilon``, twin critics with clipped double-Q,
target-policy smoothing noise (``smoothing_epsilon`` clipped to
``smoothing_clip_value``), delayed policy/target updates every
``policy_delay`` steps (`td3.py:266`).  The delay is realized in-jit by
computing the policy step every iteration and select-applying it
(branchless — cheaper than lax.cond on TPU for MLP-scale nets).
"""

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.offpolicy import OffPolicyAlgorithm
from rlx_tpu.algorithms.td3.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models.mlp import DeterministicTanhPolicy, VectorQCritic


class TD3(OffPolicyAlgorithm):
    def setup_states(self):
        a = self.config.algorithm
        self.key, policy_key, critic_key = jax.random.split(self.key, 3)
        self.epsilon = a.epsilon
        self.smoothing_epsilon = a.smoothing_epsilon
        self.smoothing_clip_value = a.smoothing_clip_value
        self.policy_delay = a.policy_delay

        self.policy = DeterministicTanhPolicy(
            action_dim=self.action_dim,
            hidden_sizes=tuple(a.policy_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )
        self.critic = VectorQCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=2,
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

        # --- critic -----------------------------------------------------
        def critic_loss_fn(critic_params):
            smoothing_noise = jnp.clip(
                self.smoothing_epsilon * jax.random.normal(key, batch["action"].shape),
                -self.smoothing_clip_value,
                self.smoothing_clip_value,
            )
            next_action = jnp.clip(
                self.policy.apply(policy_state.target_params, batch["next_observation"])
                + smoothing_noise,
                -1.0,
                1.0,
            )
            next_q = self.critic.apply(
                critic_state.target_params, batch["next_observation"], next_action
            ).squeeze(-1)
            y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * jnp.min(next_q, axis=0)
            q = self.critic.apply(critic_params, batch["observation"], batch["action"]).squeeze(-1)
            return ((q - stop_gradient(y)[None, :]) ** 2).mean(), q.mean()

        (q_loss, q_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            critic_state.params
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)

        # --- delayed policy + target updates (branchless select) --------
        def policy_loss_fn(policy_params):
            action = self.policy.apply(policy_params, batch["observation"])
            q = self.critic.apply(stop_gradient(critic_state.params), batch["observation"], action)
            return -q[0].mean()

        policy_loss, policy_grads = jax.value_and_grad(policy_loss_fn)(policy_state.params)
        updated_policy = policy_state.apply_gradients(grads=policy_grads)
        updated_policy = updated_policy.replace(
            target_params=optax.incremental_update(
                updated_policy.params, policy_state.target_params, self.tau
            )
        )
        updated_critic_targets = optax.incremental_update(
            critic_state.params, critic_state.target_params, self.tau
        )

        do_update = (step % self.policy_delay) == 0
        select = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(do_update, n, o), new, old
        )
        policy_state = select(updated_policy, policy_state.replace(step=policy_state.step + 1))
        critic_state = critic_state.replace(
            target_params=select(updated_critic_targets, critic_state.target_params)
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
