"""REPPO: on-policy pathwise policy optimization with an HL-Gauss Q-critic.

Parity with `rl_x/algorithms/reppo/flax_full_jit/reppo.py`:
- on-policy rollouts; TD(lambda) value targets via a reverse scan using
  next-state Q-values under freshly sampled policy actions (`reppo.py:173,206`);
- (s, a) critic with an HL-Gauss categorical head (151 bins) trained by
  cross-entropy, plus a self-predictive auxiliary head that regresses the
  next state-action latent (`reppo.py:226-245`), losses masked at
  truncations;
- pathwise policy loss: maximize Q(s, a_reparam) with a LEARNED entropy
  coefficient and a sampled-KL trust region against the iteration-start
  policy — the loss switches to pure KL minimization when the KL bound is
  exceeded (`reppo.py:248-289`);
- running observation normalizer.
"""

import time
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.reppo.tpu.general_properties import GeneralProperties
from rlx_tpu.models.mlp import MLP
from rlx_tpu.ops import normalizers
from rlx_tpu.ops.distributional import hl_gauss_expectation, hl_gauss_targets
from rlx_tpu.parallel import mesh as mesh_lib
from rlx_tpu.utils import checkpoint as ckpt
from rlx_tpu.utils.logging import MetricsLogger, rlx_logger
from rlx_tpu.algorithms.training_program import run_training_program


class ReppoPolicy(nn.Module):
    action_dim: int
    hidden_dim: int
    min_std: float = 0.0
    init_entropy_coefficient: float = 0.01
    init_kl_coefficient: float = 0.01
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, x):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        h = MLP((self.hidden_dim, self.hidden_dim), "elu", layer_norm=True)(x)
        loc = nn.Dense(self.action_dim)(h)
        log_std = nn.Dense(self.action_dim)(h)
        log_std = jnp.clip(log_std, -10.0, 2.0)
        log_ent = self.param(
            "log_entropy_coefficient",
            nn.initializers.constant(float(np.log(self.init_entropy_coefficient))), ()
        )
        log_kl = self.param(
            "log_kl_coefficient",
            nn.initializers.constant(float(np.log(self.init_kl_coefficient))), ()
        )
        return loc, log_std, log_ent, log_kl


class ReppoCritic(nn.Module):
    hidden_dim: int
    nr_bins: int
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        features = MLP((self.hidden_dim, self.hidden_dim), "elu", layer_norm=True)(x)
        logits = nn.Dense(self.nr_bins)(features)
        predicted_next_features = nn.Dense(self.hidden_dim)(features)
        return features, logits, predicted_next_features


class REPPO:
    def __init__(self, config, train_env, eval_env, run_path, writer):
        self.config = config
        self.train_env = train_env
        self.eval_env = eval_env
        self.run_path = run_path

        a = config.algorithm
        self.save_model = config.runner.save_model
        self.save_path = f"{run_path}/models" if run_path else None
        self.seed = config.environment.seed
        self.total_timesteps = int(a.total_timesteps)
        self.nr_envs = config.environment.nr_envs
        self.nr_steps = a.nr_steps
        self.nr_epochs = a.nr_epochs
        self.nr_minibatches = a.nr_minibatches
        self.gamma = a.gamma
        self.gae_lambda = a.gae_lambda
        self.kl_bound = a.kl_bound
        self.aux_coef = a.auxiliary_loss_coefficient
        self.nr_kl_samples = a.nr_kl_samples
        self.v_min, self.v_max = a.v_min, a.v_max
        self.nr_bins = a.nr_bins
        self.normalize_obs = a.normalize_observation
        self.evaluation_active = a.evaluation_active

        # Parallel seeds (the reference's reppo full_jit plumbs this too,
        # capped at 1); same callback constraints as ppo.py:74-88
        self.nr_parallel_seeds = int(getattr(a, "nr_parallel_seeds", 1))
        if self.nr_parallel_seeds > 1 and (a.logging_active or self.save_model):
            raise ValueError(
                "nr_parallel_seeds > 1 requires algorithm.logging_active=False "
                "and runner.save_model=False (callbacks cannot run under vmap)"
            )
        if self.nr_parallel_seeds > 1 and config.runner.chunked_train:
            raise ValueError(
                "nr_parallel_seeds > 1 runs one fused vmapped program and cannot "
                "honor runner.chunked_train"
            )

        self.batch_size = self.nr_envs * self.nr_steps
        self.minibatch_size = self.batch_size // self.nr_minibatches
        self.nr_updates = max(self.total_timesteps // self.batch_size, 1)
        self.eval_save_frequency = a.evaluation_and_save_frequency
        if self.eval_save_frequency == -1:
            self.eval_save_frequency = self.batch_size * self.nr_updates
        self.nr_eval_save_iterations = max(self.total_timesteps // self.eval_save_frequency, 1)
        self.nr_updates_per_eval_save_iteration = self.eval_save_frequency // self.batch_size

        self.horizon = train_env.horizon
        self.os_shape = train_env.single_observation_space.shape
        self.as_shape = train_env.single_action_space.shape
        self.action_dim = int(np.prod(self.as_shape))
        self.target_entropy = -0.5 * a.target_entropy_multiplier * self.action_dim * 2

        self.mesh = mesh_lib.make_mesh(
            dp=(None if config.runner.mesh_dp == -1 else config.runner.mesh_dp),
            tp=config.runner.mesh_tp,
        )
        self.logger = MetricsLogger(
            config.runner.track_console, config.runner.track_tb, config.runner.track_wandb, writer
        )
        rlx_logger.info(f"Using device: {jax.default_backend()}, mesh: {dict(self.mesh.shape)}")

        self.key = jax.random.PRNGKey(self.seed)
        self.key, policy_key, critic_key = jax.random.split(self.key, 3)

        self.policy = ReppoPolicy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            min_std=a.policy_min_std,
            init_entropy_coefficient=a.init_entropy_coefficient,
            init_kl_coefficient=a.init_kl_coefficient,
            observation_indices=getattr(train_env, "policy_observation_indices", None),
        )
        self.critic = ReppoCritic(
            hidden_dim=a.critic_hidden_dim,
            nr_bins=self.nr_bins,
            observation_indices=getattr(train_env, "critic_observation_indices", None),
        )

        self._make_tx = lambda: optax.chain(
            optax.clip_by_global_norm(a.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=a.learning_rate),
        )
        self.policy_state, self.critic_state = self._make_train_states(policy_key, critic_key)
        repl = mesh_lib.replicated_sharding(self.mesh)
        self.policy_state = jax.device_put(self.policy_state, repl)
        self.critic_state = jax.device_put(self.critic_state, repl)
        self.obs_normalizer = normalizers.obs_normalizer_init(self.os_shape)
        self._last_log_time = time.time()

    def _make_train_states(self, policy_key, critic_key):
        """Jittable per-seed network/optimizer init (vmapped by
        ``_train_parallel_seeds``; called eagerly for single-seed runs)."""
        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((1, self.action_dim), jnp.float32)
        policy_state = TrainState.create(
            apply_fn=self.policy.apply,
            params=self.policy.init(policy_key, dummy_obs), tx=self._make_tx(),
        )
        critic_state = TrainState.create(
            apply_fn=self.critic.apply,
            params=self.critic.init(critic_key, dummy_obs, dummy_action), tx=self._make_tx(),
        )
        return policy_state, critic_state

    # ------------------------------------------------------------------ math

    def _sample(self, loc, log_std, key):
        std = jnp.exp(log_std)
        pre = loc + std * jax.random.normal(key, loc.shape)
        action = jnp.tanh(pre)
        log_prob = (-0.5 * ((pre - loc) / std) ** 2 - 0.5 * jnp.log(2 * jnp.pi) - log_std)
        log_prob -= 2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))
        return action, log_prob.sum(-1)

    def _log_prob(self, loc, log_std, action):
        pre = jnp.arctanh(jnp.clip(action, -1.0 + 1e-6, 1.0 - 1e-6))
        std = jnp.exp(log_std)
        log_prob = (-0.5 * ((pre - loc) / std) ** 2 - 0.5 * jnp.log(2 * jnp.pi) - log_std)
        log_prob -= 2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))
        return log_prob.sum(-1)

    def _norm(self, normalizer, observation):
        if self.normalize_obs:
            return normalizers.obs_normalize(normalizer, observation)
        return observation

    def _learning_iteration(self, carry, learning_iteration_step, outer_step):
        policy_state, critic_state, obs_normalizer, env_state, key = carry
        old_policy_params = policy_state.params

        def single_rollout_step(rollout_carry, _):
            policy_state, critic_state, obs_normalizer, env_state, key = rollout_carry
            key, act_key, next_key = jax.random.split(key, 3)
            observation = self._norm(obs_normalizer, env_state.observation)
            loc, log_std, _, _ = self.policy.apply(policy_state.params, observation)
            action, _ = self._sample(loc, log_std, act_key)
            env_state = self.train_env.step(env_state, action)
            if self.normalize_obs:
                obs_normalizer = normalizers.obs_normalizer_update(
                    obs_normalizer, env_state.observation
                )
            next_observation = self._norm(obs_normalizer, env_state.final_observation)
            n_loc, n_log_std, _, _ = self.policy.apply(policy_state.params, next_observation)
            next_action, _ = self._sample(n_loc, n_log_std, next_key)
            next_features, next_logits, _ = self.critic.apply(
                critic_state.params, next_observation, next_action
            )
            next_value = hl_gauss_expectation(next_logits, self.v_min, self.v_max)
            transition = (
                observation, action, env_state.reward, next_value,
                stop_gradient(next_features), env_state.terminated, env_state.truncated,
                env_state.info,
            )
            return (policy_state, critic_state, obs_normalizer, env_state, key), transition

        (policy_state, critic_state, obs_normalizer, env_state, key), batch = jax.lax.scan(
            single_rollout_step,
            (policy_state, critic_state, obs_normalizer, env_state, key),
            None, self.nr_steps,
        )
        observations, actions, rewards, next_values, next_features, terminations, truncations, infos = batch
        terminations = terminations.astype(jnp.float32)

        # TD(lambda) targets, reverse scan
        def td_lambda(next_target, inputs):
            reward, termination, next_value = inputs
            target = reward + self.gamma * (1.0 - termination) * (
                (1.0 - self.gae_lambda) * next_value + self.gae_lambda * next_target
            )
            return target, target

        _, target_values = jax.lax.scan(
            td_lambda, next_values[-1], (rewards, terminations, next_values), reverse=True
        )

        batch_obs = mesh_lib.shard_batch(observations.reshape((-1,) + self.os_shape), self.mesh)
        batch_actions = actions.reshape((-1, self.action_dim))
        batch_targets = target_values.reshape(-1)
        batch_next_features = next_features.reshape((-1, next_features.shape[-1]))
        batch_term = terminations.reshape(-1)
        batch_trunc = truncations.reshape(-1).astype(jnp.float32)

        def critic_loss_fn(critic_params, obs_mb, action_mb, target_mb, next_feat_mb, term_mb, trunc_mb):
            _, logits, predicted_next = self.critic.apply(critic_params, obs_mb, action_mb)
            target_dist = hl_gauss_targets(
                jnp.clip(target_mb, self.v_min, self.v_max), self.v_min, self.v_max, self.nr_bins
            )
            ce = optax.softmax_cross_entropy(logits, stop_gradient(target_dist))
            aux = ((predicted_next - next_feat_mb) ** 2).mean(-1)
            loss = ((1.0 - trunc_mb) * ce).mean() + self.aux_coef * (
                (1.0 - trunc_mb) * (1.0 - term_mb) * aux
            ).mean()
            value = hl_gauss_expectation(logits, self.v_min, self.v_max)
            return loss, {"loss/critic_loss": ce.mean(), "loss/auxiliary_loss": aux.mean(),
                          "v_value/value": value.mean()}

        def policy_loss_fn(policy_params, critic_params, obs_mb, sample_key, kl_key):
            loc, log_std, log_ent, log_kl = self.policy.apply(policy_params, obs_mb)
            new_action, new_log_prob = self._sample(loc, log_std, sample_key)
            _, logits, _ = self.critic.apply(critic_params, obs_mb, new_action)
            value = hl_gauss_expectation(logits, self.v_min, self.v_max)

            old_loc, old_log_std, _, _ = self.policy.apply(old_policy_params, obs_mb)
            shape = (self.nr_kl_samples,) + old_loc.shape
            old_actions, old_log_probs = self._sample(
                jnp.broadcast_to(old_loc, shape), jnp.broadcast_to(old_log_std, shape), kl_key
            )
            new_log_probs_at_old = self._log_prob(
                jnp.broadcast_to(loc, shape), jnp.broadcast_to(log_std, shape), old_actions
            )
            kl = jnp.mean(old_log_probs - new_log_probs_at_old, axis=0)

            ent_coef = jnp.exp(log_ent)
            kl_coef = jnp.exp(log_kl)
            clipped_loss = jnp.where(
                kl < self.kl_bound,
                new_log_prob * stop_gradient(ent_coef) - value,
                kl * stop_gradient(kl_coef),
            )
            entropy = -new_log_prob
            ent_coef_loss = ent_coef * stop_gradient(self.target_entropy + entropy)
            kl_coef_loss = -kl_coef * stop_gradient(kl - self.kl_bound)
            loss = clipped_loss.mean() + ent_coef_loss.mean() + kl_coef_loss.mean()
            metrics = {
                "loss/policy_loss": clipped_loss.mean(),
                "entropy/entropy": entropy.mean(),
                "entropy/entropy_coefficient": ent_coef,
                "kl/kl_divergence": kl.mean(),
                "kl/kl_coefficient": kl_coef,
                "q_value/policy_q": value.mean(),
            }
            return loss, metrics

        critic_grad_fn = jax.value_and_grad(critic_loss_fn, has_aux=True)
        policy_grad_fn = jax.value_and_grad(policy_loss_fn, has_aux=True)

        def epoch_iteration(epoch_carry, epoch_key):
            policy_state, critic_state = epoch_carry
            shuffle_key, mb_key = jax.random.split(epoch_key)
            indices = jax.random.permutation(shuffle_key, self.batch_size)
            indices = indices.reshape((self.nr_minibatches, self.minibatch_size))

            def minibatch_update(carry, mb_indices):
                policy_state, critic_state, mb_key = carry
                mb_key, sample_key, kl_key = jax.random.split(mb_key, 3)
                (_, critic_metrics), critic_grads = critic_grad_fn(
                    critic_state.params,
                    batch_obs[mb_indices], batch_actions[mb_indices], batch_targets[mb_indices],
                    batch_next_features[mb_indices], batch_term[mb_indices], batch_trunc[mb_indices],
                )
                critic_state = critic_state.apply_gradients(grads=critic_grads)
                (_, policy_metrics), policy_grads = policy_grad_fn(
                    policy_state.params, critic_state.params,
                    batch_obs[mb_indices], sample_key, kl_key,
                )
                policy_state = policy_state.apply_gradients(grads=policy_grads)
                return (policy_state, critic_state, mb_key), {**critic_metrics, **policy_metrics}

            (policy_state, critic_state, _), metrics = jax.lax.scan(
                minibatch_update, (policy_state, critic_state, mb_key), indices
            )
            return (policy_state, critic_state), metrics

        key, epochs_key = jax.random.split(key)
        (policy_state, critic_state), metrics = jax.lax.scan(
            epoch_iteration, (policy_state, critic_state),
            jax.random.split(epochs_key, self.nr_epochs),
        )
        metrics = jax.tree.map(jnp.mean, metrics)

        if self.config.algorithm.logging_active:
            combined = {**jax.tree.map(jnp.mean, infos), **metrics}
            combined_step = outer_step * self.nr_updates_per_eval_save_iteration + learning_iteration_step + 1
            jax.debug.callback(self._log_train_callback, combined, combined_step)

        return (policy_state, critic_state, obs_normalizer, env_state, key), None

    def _init_train_carry(self, key, states=None):
        policy_state, critic_state, obs_normalizer = (
            (self.policy_state, self.critic_state, self.obs_normalizer)
            if states is None else states
        )
        key, reset_key = jax.random.split(key)
        env_state = self.train_env.reset(reset_key, eval_mode=False)
        env_state = mesh_lib.shard_batch(env_state, self.mesh)
        return (policy_state, critic_state, obs_normalizer, env_state, key)

    def _eval_save_iteration(self, carry, outer_step):
        policy_state, critic_state, obs_normalizer, env_state, key = carry
        key, learn_key, eval_key = jax.random.split(key, 3)
        (policy_state, critic_state, obs_normalizer, env_state, _), _ = jax.lax.scan(
            partial(self._learning_iteration, outer_step=outer_step),
            (policy_state, critic_state, obs_normalizer, env_state, learn_key),
            jnp.arange(self.nr_updates_per_eval_save_iteration),
        )
        eval_metrics = None
        if self.evaluation_active:
            eval_metrics = self._eval_iteration(policy_state, obs_normalizer, eval_key, outer_step)
        if self.save_model:
            jax.debug.callback(self._save_callback, policy_state, critic_state)
        return (policy_state, critic_state, obs_normalizer, env_state, key), eval_metrics

    def build_train_function(self):
        def jitable_train_function(key):
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key),
                jnp.arange(self.nr_eval_save_iterations),
            )

        return jitable_train_function

    def _eval_iteration(self, policy_state, obs_normalizer, key, outer_step):
        def single_eval_step(carry, _):
            policy_state, eval_env_state = carry
            observation = self._norm(obs_normalizer, eval_env_state.observation)
            loc, _, _, _ = self.policy.apply(policy_state.params, observation)
            eval_env_state = self.eval_env.step(eval_env_state, jnp.tanh(loc))
            return (policy_state, eval_env_state), None

        eval_env_state = self.eval_env.reset(key, eval_mode=True)
        (_, eval_env_state), _ = jax.lax.scan(
            single_eval_step, (policy_state, eval_env_state), None, self.horizon
        )
        eval_metrics = {
            "eval/episode_return": jnp.mean(eval_env_state.info["rollout/episode_return"]),
            "eval/episode_length": jnp.mean(eval_env_state.info["rollout/episode_length"]),
        }
        if self.config.algorithm.logging_active:
            jax.debug.callback(self._log_eval_callback, eval_metrics, outer_step)
        return eval_metrics

    def _train_parallel_seeds(self, run_key):
        """vmap the whole program over a seed axis (ppo.py pattern)."""

        def per_seed(key):
            key, init_key = jax.random.split(key)
            policy_key, critic_key = jax.random.split(init_key)
            policy_state, critic_state = self._make_train_states(policy_key, critic_key)
            states = (policy_state, critic_state,
                      normalizers.obs_normalizer_init(self.os_shape))
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key, states),
                jnp.arange(self.nr_eval_save_iterations),
            )

        seed_keys = jax.random.split(run_key, self.nr_parallel_seeds)
        carries, eval_history = jax.block_until_ready(
            jax.jit(jax.vmap(per_seed))(seed_keys)
        )
        first = jax.tree.map(lambda x: x[0], (carries[0], carries[1], carries[2]))
        return first, eval_history

    def train(self):
        self.key, run_key = jax.random.split(self.key)
        self._last_log_time = time.time()
        start = time.time()
        if self.nr_parallel_seeds > 1:
            (self.policy_state, self.critic_state, self.obs_normalizer), eval_history = (
                self._train_parallel_seeds(run_key)
            )
        else:
            carry, eval_history = run_training_program(self, run_key)
            self.policy_state, self.critic_state, self.obs_normalizer = carry[0], carry[1], carry[2]
        # callback-free curve record (see ppo.py train())
        self.eval_history = None
        if eval_history is not None:
            steps = (np.arange(self.nr_eval_save_iterations) + 1) * self.nr_updates_per_eval_save_iteration * self.batch_size
            self.eval_history = {"steps": steps}
            self.eval_history.update({k: np.asarray(v) for k, v in eval_history.items()})
        rlx_logger.info(f"Average time: {time.time() - start:.2f} s")

    def _log_train_callback(self, metrics, combined_step):
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        now = time.time()
        metrics["time/sps"] = int(self.batch_size / max(now - self._last_log_time, 1e-9))
        self._last_log_time = now
        global_step = int(np.asarray(combined_step)) * self.batch_size
        metrics["steps/nr_env_steps"] = global_step
        self.logger.log_dict(metrics, global_step)

    def _log_eval_callback(self, metrics, outer_step):
        global_step = int((np.asarray(outer_step) + 1) * self.eval_save_frequency)
        self.logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, global_step)

    def _save_callback(self, policy_state, critic_state):
        ckpt.save_model_file(
            self.save_path, "latest.model",
            {"policy": policy_state.params, "critic": critic_state.params,
             "obs_normalizer": jax.device_get(self.obs_normalizer)},
            self.config.algorithm.to_dict(),
        )

    def save(self):
        self._save_callback(self.policy_state, self.critic_state)

    @staticmethod
    def load(config, train_env, eval_env, run_path, writer, explicitly_set_algorithm_params):
        restored, loaded_config = ckpt.load_model_file(config.runner.load_model)
        ckpt.merge_loaded_algorithm_config(config, loaded_config, explicitly_set_algorithm_params)
        model = REPPO(config, train_env, eval_env, run_path, writer)
        target = {"policy": model.policy_state.params, "critic": model.critic_state.params,
                  "obs_normalizer": model.obs_normalizer}
        restored, _ = ckpt.load_model_file(config.runner.load_model, target)
        model.policy_state = model.policy_state.replace(params=restored["policy"])
        model.critic_state = model.critic_state.replace(params=restored["critic"])
        model.obs_normalizer = restored["obs_normalizer"]
        return model

    def test(self, episodes):
        @jax.jit
        def rollout(env_state):
            observation = self._norm(self.obs_normalizer, env_state.observation)
            loc, _, _, _ = self.policy.apply(self.policy_state.params, observation)
            return self.eval_env.step(env_state, jnp.tanh(loc))

        from rlx_tpu.algorithms.evaluation import collect_test_returns

        self.key, reset_key = jax.random.split(self.key)
        env_state = self.eval_env.reset(reset_key, eval_mode=True)
        return collect_test_returns(rollout, env_state, episodes, self.horizon)

    def general_properties():
        return GeneralProperties
