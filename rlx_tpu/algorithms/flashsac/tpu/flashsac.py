"""FlashSAC: SAC with explicitly-projected unit-norm BatchNorm nets,
categorical twin critics, colored exploration noise, and reward
normalization — exact-architecture parity with
`rl_x/algorithms/flashsac/flax/flashsac.py` + `layers.py:8-127`:

- the layer zoo (`layers.py` here): BatchNorm-whitened residual MLP trunks
  with bias-free orthogonal kernels, an RMSNorm pre-head, a tanh-bounded
  NormalTanhPolicy head and a categorical (C51-style) value head;
- :func:`layers.project_params` applied at init AND after every policy /
  critic gradient step (`flashsac.py:104-118, 199-201, 290-292`);
- twin categorical critics with per-sample min-VALUE critic selection and a
  cross-entropy loss against the entropy-adjusted projected target
  distribution (`flashsac.py:231-285`);
- train-mode BatchNorm streams: policy stats advance over the joint
  (s, s') batch in the policy loss; online AND target critics each advance
  their own stats over the joint (s|s', a|a') batch (`flashsac.py:174-181,
  242-247, 276-280`); acting/eval use running averages;
- zeta-repeated (temporally colored) exploration noise
  (`noise_repeat.py:5-34`), reward normalization with a G_max clamp
  (`reward_normalizer.py:4-42`), warmup-cosine learning-rate decay, delayed
  policy/entropy updates, sigma-based target entropy
  (`flashsac.py:73-74`: 0.5 * d * log(2*pi*e*sigma^2)).

Scaffolding (fused program, replay, eval cadence) comes from
``OffPolicyAlgorithm`` via ``SAC``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.flashsac.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.flashsac.tpu.layers import (
    FlashSACDoubleCritic,
    FlashSACPolicy,
    project_params,
)
from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.models.mlp import EntropyCoefficient
from rlx_tpu.ops import normalizers
from rlx_tpu.ops.distributional import categorical_projection_dense


class BNTrainState(TrainState):
    batch_stats: core.FrozenDict = struct.field(pytree_node=True, default=None)


class BNTargetTrainState(TrainState):
    batch_stats: core.FrozenDict = struct.field(pytree_node=True, default=None)
    target_params: core.FrozenDict = struct.field(pytree_node=True, default=None)
    target_batch_stats: core.FrozenDict = struct.field(pytree_node=True, default=None)


def build_zeta_cdf(mu, max_n):
    ns = np.arange(1, max_n + 1, dtype=np.float32)
    pmf = ns ** (-mu)
    return np.cumsum(pmf / pmf.sum())


class FlashSAC(SAC):
    def setup_states(self):
        a = self.config.algorithm
        self.policy_delay = a.policy_delay
        self.nr_atoms = a.nr_atoms
        self.v_min, self.v_max = a.v_min, a.v_max
        self.normalized_g_max = a.normalized_g_max
        self.normalize_rewards = a.enable_reward_normalization
        sigma = a.target_entropy_sigma
        self.target_entropy = 0.5 * self.action_dim * math.log(
            2.0 * math.pi * math.e * sigma * sigma
        )
        self.zeta_cdf = jnp.asarray(build_zeta_cdf(a.noise_zeta_mu, a.noise_zeta_max_repeat))

        self.key, policy_key, critic_key, alpha_key, noise_key = jax.random.split(self.key, 5)

        self.policy = FlashSACPolicy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            nr_blocks=a.policy_nr_blocks,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )
        self.critic = FlashSACDoubleCritic(
            hidden_dim=a.critic_hidden_dim,
            nr_blocks=a.critic_nr_blocks,
            nr_atoms=a.nr_atoms,
            v_min=a.v_min,
            v_max=a.v_max,
            nr_critics=a.nr_critics,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )
        self.entropy_coefficient = EntropyCoefficient(a.init_entropy_coefficient)

        total_updates = max(int(np.ceil(self.total_training_timesteps / self.nr_envs)), 1)
        lr_schedule = optax.warmup_cosine_decay_schedule(
            init_value=a.learning_rate_init,
            peak_value=a.learning_rate_peak,
            warmup_steps=a.learning_rate_warmup_steps,
            decay_steps=total_updates,
            end_value=a.learning_rate_end,
        )

        dummy_obs = jnp.zeros((2,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((2, self.action_dim), jnp.float32)
        policy_vars = self.policy.init(policy_key, dummy_obs, False)
        critic_vars = self.critic.init(critic_key, dummy_obs, dummy_action, False)

        states = {
            "policy": BNTrainState.create(
                apply_fn=self.policy.apply,
                params=project_params(policy_vars["params"]),
                batch_stats=policy_vars["batch_stats"],
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr_schedule),
            ),
            "critic": BNTargetTrainState.create(
                apply_fn=self.critic.apply,
                params=project_params(critic_vars["params"]),
                batch_stats=critic_vars["batch_stats"],
                target_params=project_params(critic_vars["params"]),
                target_batch_stats=critic_vars["batch_stats"],
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr_schedule),
            ),
            "alpha": TrainState.create(
                apply_fn=self.entropy_coefficient.apply,
                params=self.entropy_coefficient.init(alpha_key),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr_schedule),
            ),
            "noise": {
                "noise": jax.random.normal(noise_key, (self.nr_envs, self.action_dim)),
                "count": jnp.zeros((), jnp.int32),
                "n": jnp.ones((), jnp.int32),
            },
        }
        if self.normalize_rewards:
            states["reward_normalizer"] = normalizers.reward_normalizer_init(self.nr_envs)
        return states

    # --- acting ------------------------------------------------------------
    def pre_act(self, states, key, step):
        """Advance the zeta-repeated noise stream (`noise_repeat.py:25-34`)."""
        noise_state = states["noise"]
        noise_key, n_key = jax.random.split(key)
        fresh_noise = jax.random.normal(noise_key, noise_state["noise"].shape)
        u = jax.random.uniform(n_key, ())
        fresh_n = (jnp.argmax((u < self.zeta_cdf).astype(jnp.int32)) + 1).astype(jnp.int32)
        reinit = (noise_state["count"] == 0) | (noise_state["count"] >= noise_state["n"])
        return {**states, "noise": {
            "noise": jnp.where(reinit, fresh_noise, noise_state["noise"]),
            "n": jnp.where(reinit, fresh_n, noise_state["n"]),
            "count": jnp.where(reinit, 0, noise_state["count"]) + 1,
        }}

    def _policy_variables(self, state):
        return {"params": state.params, "batch_stats": state.batch_stats}

    def act(self, states, observation, key, step):
        mean, std = self.policy.apply(
            self._policy_variables(states["policy"]), observation, False
        )
        return jnp.tanh(mean + std * states["noise"]["noise"])

    def eval_act(self, states, observation):
        mean, _ = self.policy.apply(
            self._policy_variables(states["policy"]), observation, False
        )
        return jnp.tanh(mean)

    def observe_transition(self, states, observation, env_state):
        if not self.normalize_rewards:
            return states
        return {**states, "reward_normalizer": normalizers.reward_normalizer_update(
            states["reward_normalizer"], env_state.reward,
            env_state.terminated, env_state.truncated, self.gamma,
        )}

    # --- update ------------------------------------------------------------
    def _sample_and_log_prob(self, mean, std, key):
        """Squashed-Gaussian sample + log-prob (`policy.py:56-63` math, the
        softplus-stable form of log(1 - tanh^2))."""
        noise = jax.random.normal(key, mean.shape)
        base = mean + std * noise
        action = jnp.tanh(base)
        gaussian = -0.5 * noise**2 - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(std)
        correction = 2.0 * (jnp.log(2.0) - base - jax.nn.softplus(-2.0 * base))
        return action, jnp.sum(gaussian - correction, axis=-1)

    def update(self, states, batch, key, step):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        policy_key, critic_key = jax.random.split(key)

        obs = batch["observation"]
        if self.n_step > 1:
            next_obs = batch["n_step_next_observation"]
            reward = batch["n_step_reward"]
            discount = batch["n_step_gamma"] * (1.0 - batch["n_step_terminated"])
        else:
            next_obs = batch["next_observation"]
            reward = batch["reward"]
            discount = self.gamma * (1.0 - batch["terminated"])
        if self.normalize_rewards:
            reward = normalizers.reward_normalize(
                states["reward_normalizer"], reward, self.normalized_g_max
            )
        B = obs.shape[0]
        bins = jnp.linspace(self.v_min, self.v_max, self.nr_atoms, dtype=jnp.float32)

        # ---- policy + entropy-coefficient step (delayed) -----------------
        def policy_loss_fn(policy_params):
            # ONE train-mode forward over the joint (s, s') batch so the
            # policy's BatchNorm statistics see both marginals
            joint = jnp.concatenate([obs, next_obs], axis=0)
            (mean_all, std_all), mutated = self.policy.apply(
                {"params": policy_params, "batch_stats": policy_state.batch_stats},
                joint, True, mutable=["batch_stats"],
            )
            action, log_prob = self._sample_and_log_prob(
                mean_all[:B], std_all[:B], policy_key
            )
            q_values, _ = self.critic.apply(
                {"params": critic_state.params, "batch_stats": critic_state.batch_stats},
                obs, action, False,
            )
            q = jnp.min(q_values, axis=0)
            alpha = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))
            loss = jnp.mean(alpha * log_prob - q)
            entropy = -jnp.mean(log_prob)
            return loss, (mutated["batch_stats"], entropy, jnp.mean(q))

        (policy_loss, (policy_bn, entropy, policy_q_mean)), policy_grads = (
            jax.value_and_grad(policy_loss_fn, has_aux=True)(policy_state.params)
        )
        updated_policy = policy_state.apply_gradients(grads=policy_grads)
        updated_policy = updated_policy.replace(
            params=project_params(updated_policy.params), batch_stats=policy_bn
        )

        def alpha_loss_fn(alpha_params):
            alpha = self.entropy_coefficient.apply(alpha_params)
            return alpha * (stop_gradient(entropy) - self.target_entropy), alpha

        (alpha_loss, alpha_val), alpha_grads = jax.value_and_grad(
            alpha_loss_fn, has_aux=True
        )(alpha_state.params)
        updated_alpha = alpha_state.apply_gradients(grads=alpha_grads)

        do_policy = (step % self.policy_delay) == 0
        select = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(do_policy, n, o), new, old
        )
        policy_state = select(updated_policy, policy_state)
        alpha_state = select(updated_alpha, alpha_state)

        # ---- critic step -------------------------------------------------
        def critic_loss_fn(critic_params):
            next_mean, next_std = self.policy.apply(
                self._policy_variables(policy_state), next_obs, False
            )
            next_action, next_log_prob = self._sample_and_log_prob(
                next_mean, next_std, critic_key
            )
            alpha = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))

            joint_obs = jnp.concatenate([obs, next_obs], axis=0)
            joint_action = jnp.concatenate([batch["action"], next_action], axis=0)

            # target critic advances its OWN BatchNorm stream (train mode
            # over the joint batch, `flashsac.py:242-247`)
            (_, target_log_probs), target_mutated = self.critic.apply(
                {"params": critic_state.target_params,
                 "batch_stats": critic_state.target_batch_stats},
                joint_obs, joint_action, True, mutable=["batch_stats"],
            )
            next_log_probs = target_log_probs[:, B:, :]          # [n, B, A]
            next_values = jnp.sum(jnp.exp(next_log_probs) * bins, axis=-1)
            min_idx = jnp.argmin(next_values, axis=0)            # per-sample min critic
            selected = jnp.take_along_axis(
                next_log_probs, min_idx[None, :, None], axis=0
            )[0]                                                  # [B, A]

            # entropy-adjusted shifted support, projected onto the atom grid
            target_bins = reward[:, None] + discount[:, None] * (
                bins[None, :] - (alpha * next_log_prob)[:, None]
            )
            target_probs = stop_gradient(categorical_projection_dense(
                target_bins, jnp.exp(selected), self.v_min, self.v_max, self.nr_atoms
            ))

            (_, predicted_log_probs), mutated = self.critic.apply(
                {"params": critic_params, "batch_stats": critic_state.batch_stats},
                joint_obs, joint_action, True, mutable=["batch_stats"],
            )
            predicted_log_probs = predicted_log_probs[:, :B, :]
            cross_entropy = -jnp.sum(
                target_probs[None, :, :] * predicted_log_probs, axis=-1
            )
            return jnp.mean(cross_entropy), (
                mutated["batch_stats"], target_mutated["batch_stats"],
                jnp.mean(next_values),
            )

        (critic_loss, (critic_bn, target_bn, target_q_mean)), critic_grads = (
            jax.value_and_grad(critic_loss_fn, has_aux=True)(critic_state.params)
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        critic_state = critic_state.replace(
            params=project_params(critic_state.params),
            batch_stats=critic_bn,
            target_params=optax.incremental_update(
                critic_state.params, critic_state.target_params, self.tau
            ),
            target_batch_stats=target_bn,
        )

        metrics = {
            "loss/policy_loss": policy_loss,
            "loss/q_loss": critic_loss,
            "loss/entropy_loss": alpha_loss,
            "entropy/entropy": entropy,
            "entropy/alpha": alpha_val,
            "q_value/policy_q_mean": policy_q_mean,
            "q_value/target_q_mean": target_q_mean,
            "lr/learning_rate": critic_state.opt_state.hyperparams["learning_rate"],
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return {
            **states,
            "policy": policy_state,
            "critic": critic_state,
            "alpha": alpha_state,
        }, metrics

    # --- checkpointing ------------------------------------------------------
    def checkpoint_tree(self, states):
        tree = super().checkpoint_tree(states)
        if not self.config.runner.save_optimizer_state:
            tree["policy_batch_stats"] = states["policy"].batch_stats
            tree["critic_batch_stats"] = states["critic"].batch_stats
            tree["critic_target_batch_stats"] = states["critic"].target_batch_stats
        return tree

    def restore_from_tree(self, restored):
        super().restore_from_tree(restored)
        if "policy_batch_stats" in restored:
            self.states["policy"] = self.states["policy"].replace(
                batch_stats=restored["policy_batch_stats"]
            )
            self.states["critic"] = self.states["critic"].replace(
                batch_stats=restored["critic_batch_stats"],
                target_batch_stats=restored["critic_target_batch_stats"],
            )

    def general_properties():
        return GeneralProperties
