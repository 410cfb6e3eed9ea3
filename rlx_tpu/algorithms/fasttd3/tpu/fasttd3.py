"""FastTD3: massively-parallel TD3 with distributional categorical critics.

Parity with `rl_x/algorithms/fasttd3/flax_full_jit/fasttd3.py`:
- twin categorical critics over a fixed [v_min, v_max] support (101 atoms),
  trained by cross-entropy against the projected target distribution
  (`fasttd3.py:287-339`);
- clipped double-Q on distributions: per sample, the target uses the critic
  with the LOWER expected value (`fasttd3.py:326-332`), toggleable;
- n-step returns sampled from the circular buffer with truncation patching
  (`fasttd3.py:380-392` — rlx_tpu.ops.replay_buffer.sample_nstep);
- per-env exploration noise scales, linearly spaced in
  [noise_std_min, noise_std_max];
- running observation normalizer (`fasttd3.py:143-150,196`);
- AdamW (weight decay 0.1), critic:policy update ratio.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.lax import stop_gradient

from rlx_tpu.algorithms.fasttd3.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.offpolicy import OffPolicyAlgorithm
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models.mlp import DeterministicTanhPolicy, VectorQCritic
from rlx_tpu.ops import normalizers
from rlx_tpu.ops.distributional import categorical_projection_dense as categorical_projection


class FastTD3(OffPolicyAlgorithm):
    def setup_states(self):
        a = self.config.algorithm
        self.key, policy_key, critic_key = jax.random.split(self.key, 3)
        self.v_min, self.v_max = a.v_min, a.v_max
        self.nr_atoms = a.nr_atoms
        self.atoms = jnp.linspace(self.v_min, self.v_max, self.nr_atoms)
        self.smoothing_epsilon = a.smoothing_epsilon
        self.smoothing_clip_value = a.smoothing_clip_value
        self.policy_delay = a.nr_critic_updates_per_policy_update
        self.clipped_double_q = a.clipped_double_q_learning
        self.normalize_obs = a.enable_observation_normalization
        self.noise_scales = jnp.linspace(a.noise_std_min, a.noise_std_max, self.nr_envs)

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
            output_dim=self.nr_atoms,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

        def tx():
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=self.learning_rate, weight_decay=a.weight_decay
            )

        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((1, self.action_dim), jnp.float32)
        return {
            "policy": RLTrainState.create(
                apply_fn=self.policy.apply,
                params=self.policy.init(policy_key, dummy_obs),
                target_params=self.policy.init(policy_key, dummy_obs),
                tx=tx(),
            ),
            "critic": RLTrainState.create(
                apply_fn=self.critic.apply,
                params=self.critic.init(critic_key, dummy_obs, dummy_action),
                target_params=self.critic.init(critic_key, dummy_obs, dummy_action),
                tx=tx(),
            ),
            "obs_normalizer": normalizers.obs_normalizer_init(self.os_shape),
        }

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
        action = self.policy.apply(states["policy"].params, self._norm(states, observation))
        noise = self.noise_scales[:, None] * jax.random.normal(key, action.shape)
        return jnp.clip(action + noise, -1.0, 1.0)

    def eval_act(self, states, observation):
        return self.policy.apply(states["policy"].params, self._norm(states, observation))

    def expected_value(self, logits):
        """[..., atoms] logits -> [...] expected value."""
        return (jax.nn.softmax(logits, axis=-1) * self.atoms).sum(-1)

    def update(self, states, batch, key, step):
        policy_state, critic_state = states["policy"], states["critic"]
        obs = self._norm(states, batch["observation"])
        next_obs = self._norm(states, batch["n_step_next_observation" if self.n_step > 1 else "next_observation"])
        reward = batch["n_step_reward"] if self.n_step > 1 else batch["reward"]
        terminated = batch["n_step_terminated"] if self.n_step > 1 else batch["terminated"]
        discount = batch["n_step_gamma"] if self.n_step > 1 else jnp.full_like(reward, self.gamma)

        smoothing_noise = jnp.clip(
            self.smoothing_epsilon * jax.random.normal(key, (obs.shape[0], self.action_dim)),
            -self.smoothing_clip_value,
            self.smoothing_clip_value,
        )
        next_action = jnp.clip(
            self.policy.apply(policy_state.target_params, next_obs) + smoothing_noise, -1.0, 1.0
        )
        next_logits = self.critic.apply(critic_state.target_params, next_obs, next_action)  # [2, B, atoms]
        next_probs = jax.nn.softmax(next_logits, axis=-1)
        if self.clipped_double_q:
            expected = (next_probs * self.atoms).sum(-1)  # [2, B]
            lower = jnp.argmin(expected, axis=0)          # [B]
            chosen_probs = jnp.where(lower[:, None] == 0, next_probs[0], next_probs[1])
        else:
            chosen_probs = next_probs.mean(axis=0)

        target_z = reward[:, None] + discount[:, None] * (1.0 - terminated[:, None]) * self.atoms[None]
        target_dist = stop_gradient(
            categorical_projection(target_z, chosen_probs, self.v_min, self.v_max, self.nr_atoms)
        )

        def critic_loss_fn(critic_params):
            logits = self.critic.apply(critic_params, obs, batch["action"])  # [2, B, atoms]
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            loss = -(target_dist[None] * log_probs).sum(-1).mean()
            return loss, self.expected_value(logits).mean()

        (q_loss, q_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            critic_state.params
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)

        def policy_loss_fn(policy_params):
            action = self.policy.apply(policy_params, obs)
            logits = self.critic.apply(stop_gradient(critic_state.params), obs, action)
            return -self.expected_value(logits).mean(axis=-1).mean()

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
        select = lambda new, old: jax.tree.map(lambda n, o: jnp.where(do_update, n, o), new, old)
        policy_state = select(updated_policy, policy_state.replace(step=policy_state.step + 1))
        critic_state = critic_state.replace(
            target_params=select(updated_critic_targets, critic_state.target_params)
        )

        metrics = {
            "loss/q_loss": q_loss,
            "loss/policy_loss": policy_loss,
            "q_value/q_value": q_mean,
            "lr/learning_rate": policy_state.opt_state.hyperparams["learning_rate"],
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return {**states, "policy": policy_state, "critic": critic_state}, metrics

    def general_properties():
        return GeneralProperties
