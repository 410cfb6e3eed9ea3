"""SAC as ONE fused XLA program with an on-device sharded replay buffer.

Capability parity with `rl_x/algorithms/sac/flax_full_jit/sac.py:129-391`
(whole off-policy run in one jit: prefill scan, 1-env-step-1-update hot loop,
in-jit uniform replay sampling, twin-Q min target, auto-tuned alpha, polyak
target updates, logging/eval/save cadence scans), redesigned for TPU:

- replay buffer arrays ``[capacity, nr_envs, ...]`` shard the env axis over
  the mesh "dp" axis; sampling is shard-local by default so the hot-path
  gather never crosses ICI (see rlx_tpu.ops.replay_buffer).
- batched loss computation (identical math to the reference's
  vmap-then-tree-mean, `sac.py:272-275`); tanh log-prob uses the
  numerically stable softplus form of log(1 - tanh^2).
- three optimizers stepped in one fused update; target net update via
  optax.incremental_update exactly as `sac.py:297`.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.sac.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models import distributions as D
from rlx_tpu.models.mlp import EntropyCoefficient, SquashedGaussianPolicy, VectorQCritic, get_processed_action_function
from rlx_tpu.ops import replay_buffer as rb
from rlx_tpu.parallel import mesh as mesh_lib
from rlx_tpu.utils import checkpoint as ckpt
from rlx_tpu.utils.logging import MetricsLogger, rlx_logger


class SAC:
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
        self.learning_rate = a.learning_rate
        self.anneal_learning_rate = a.anneal_learning_rate
        self.buffer_size = int(a.buffer_size)
        self.learning_starts = int(a.learning_starts)
        self.batch_size = a.batch_size
        self.tau = a.tau
        self.gamma = a.gamma
        self.logging_frequency = int(a.logging_frequency)
        self.evaluation_active = a.evaluation_active

        self.total_training_timesteps = self.total_timesteps - self.learning_starts
        self.eval_save_frequency = a.evaluation_and_save_frequency
        if self.eval_save_frequency == -1:
            self.eval_save_frequency = self.nr_envs * max(self.total_training_timesteps // self.nr_envs, 1)
        self.nr_eval_save_iterations = max(self.total_training_timesteps // self.eval_save_frequency, 1)
        self.nr_loggings_per_eval_save_iteration = max(self.eval_save_frequency // self.logging_frequency, 1)
        self.nr_updates_per_logging_iteration = max(self.logging_frequency // self.nr_envs, 1)
        self.capacity = max(self.buffer_size // self.nr_envs, 1)
        self.prefill_iterations = int(np.ceil(self.learning_starts / self.nr_envs)) if self.learning_starts > 0 else 0

        self.horizon = train_env.horizon
        self.os_shape = train_env.single_observation_space.shape
        self.as_shape = train_env.single_action_space.shape
        self.action_dim = int(np.prod(self.as_shape))

        self.mesh = mesh_lib.make_mesh(
            dp=(None if config.runner.mesh_dp == -1 else config.runner.mesh_dp),
            tp=config.runner.mesh_tp,
        )
        self.dp_size = self.mesh.shape[mesh_lib.DP_AXIS]
        self.shard_local_sampling = a.shard_local_sampling

        self.logger = MetricsLogger(
            config.runner.track_console, config.runner.track_tb, config.runner.track_wandb, writer
        )
        rlx_logger.info(f"Using device: {jax.default_backend()}, mesh: {dict(self.mesh.shape)}")

        self.key = jax.random.PRNGKey(self.seed)
        self.key, policy_key, critic_key, alpha_key = jax.random.split(self.key, 4)

        obs_indices = getattr(train_env, "policy_observation_indices", None)
        critic_obs_indices = getattr(train_env, "critic_observation_indices", None)
        self.policy = SquashedGaussianPolicy(
            action_dim=self.action_dim,
            hidden_sizes=tuple(a.policy_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            log_std_min=a.log_std_min,
            log_std_max=a.log_std_max,
            observation_indices=obs_indices,
        )
        self.critic = VectorQCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=a.nr_critics,
            activation=a.activation,
            layer_norm=a.layer_norm,
            observation_indices=critic_obs_indices,
        )
        self.entropy_coefficient = EntropyCoefficient(1.0)
        self.process_action = get_processed_action_function(
            True, train_env.single_action_space.low, train_env.single_action_space.high
        )

        if a.target_entropy == "auto":
            self.target_entropy = -float(self.action_dim)
        else:
            self.target_entropy = float(a.target_entropy)

        def linear_schedule(count):
            step = (count * self.nr_envs) - self.learning_starts
            fraction = 1.0 - step / max(self.total_training_timesteps, 1)
            return self.learning_rate * fraction

        lr = linear_schedule if self.anneal_learning_rate else self.learning_rate

        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((1, self.action_dim), jnp.float32)
        self.policy_state = TrainState.create(
            apply_fn=self.policy.apply,
            params=self.policy.init(policy_key, dummy_obs),
            tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        self.critic_state = RLTrainState.create(
            apply_fn=self.critic.apply,
            params=self.critic.init(critic_key, dummy_obs, dummy_action),
            target_params=self.critic.init(critic_key, dummy_obs, dummy_action),
            tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        self.entropy_coefficient_state = TrainState.create(
            apply_fn=self.entropy_coefficient.apply,
            params=self.entropy_coefficient.init(alpha_key),
            tx=optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        repl = mesh_lib.replicated_sharding(self.mesh)
        self.policy_state = jax.device_put(self.policy_state, repl)
        self.critic_state = jax.device_put(self.critic_state, repl)
        self.entropy_coefficient_state = jax.device_put(self.entropy_coefficient_state, repl)

        self._last_log_time = time.time()

    # ----------------------------------------------------------------- steps

    def _make_buffer(self):
        buffer = rb.create(
            self.capacity,
            self.nr_envs,
            {
                "observation": (self.os_shape, jnp.float32),
                "next_observation": (self.os_shape, jnp.float32),
                "action": ((self.action_dim,), jnp.float32),
                "reward": ((), jnp.float32),
                "terminated": ((), jnp.float32),
            },
        )
        # Shard the env axis (axis 1) of every buffer array over dp.
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, mesh_lib.DP_AXIS)
        )
        data = {
            name: jax.lax.with_sharding_constraint(arr, sharding)
            for name, arr in buffer.data.items()
        }
        return buffer.replace(data=data)

    def _store_step(self, buffer, observation, action, env_state):
        return rb.add(
            buffer,
            {
                "observation": observation,
                "next_observation": env_state.final_observation,
                "action": action,
                "reward": env_state.reward,
                "terminated": env_state.terminated.astype(jnp.float32),
            },
        )

    def _learning_step(self, carry, _):
        policy_state, critic_state, alpha_state, buffer, env_state, key = carry
        key, action_key, sample_key, target_key, current_key = jax.random.split(key, 5)

        # Acting
        observation = env_state.observation
        mean, log_std = self.policy.apply(policy_state.params, observation)
        action = jnp.tanh(mean + jnp.exp(log_std) * jax.random.normal(action_key, mean.shape))
        env_state = self.train_env.step(env_state, self.process_action(action))
        buffer = self._store_step(buffer, observation, action, env_state)

        # Sampling
        batch = rb.sample(
            buffer, sample_key, self.batch_size,
            shard_local=self.shard_local_sampling, dp_size=self.dp_size,
        )
        batch = mesh_lib.shard_batch(batch, self.mesh)

        def loss_fn(policy_params, critic_params, alpha_params):
            # Critic target
            next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
                target_key, *self.policy.apply(stop_gradient(policy_params), batch["next_observation"])
            )
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            alpha = stop_gradient(alpha_with_grad)

            next_q_target = self.critic.apply(
                critic_state.target_params, batch["next_observation"], next_action
            ).squeeze(-1)  # [critics, batch]
            min_next_q_target = jnp.min(next_q_target, axis=0)

            y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * (
                min_next_q_target - alpha * next_log_prob
            )

            q = self.critic.apply(critic_params, batch["observation"], batch["action"]).squeeze(-1)
            q_loss = ((q - y[None, :]) ** 2).mean()

            # Policy loss
            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            q_pi = self.critic.apply(stop_gradient(critic_params), batch["observation"], current_action).squeeze(-1)
            min_q_pi = jnp.min(q_pi, axis=0)
            policy_loss = (alpha * current_log_prob - min_q_pi).mean()

            # Alpha loss
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
        (loss, metrics), (policy_grads, critic_grads, alpha_grads) = grad_loss_fn(
            policy_state.params, critic_state.params, alpha_state.params
        )

        policy_state = policy_state.apply_gradients(grads=policy_grads)
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        alpha_state = alpha_state.apply_gradients(grads=alpha_grads)
        critic_state = critic_state.replace(
            target_params=optax.incremental_update(critic_state.params, critic_state.target_params, self.tau)
        )

        metrics["lr/learning_rate"] = policy_state.opt_state.hyperparams["learning_rate"]
        metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
        metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
        metrics["gradients/entropy_grad_norm"] = optax.global_norm(alpha_grads)

        carry = (policy_state, critic_state, alpha_state, buffer, env_state, key)
        return carry, (env_state.info, metrics)

    def _logging_iteration(self, carry, logging_iteration_step, eval_save_iteration_step):
        policy_state, critic_state, alpha_state, buffer, env_state, key = carry
        key, subkey = jax.random.split(key)
        carry, (infos, metrics) = jax.lax.scan(
            self._learning_step,
            (policy_state, critic_state, alpha_state, buffer, env_state, subkey),
            None,
            self.nr_updates_per_logging_iteration,
        )
        if self.config.algorithm.logging_active:
            combined = {**jax.tree.map(jnp.mean, infos), **jax.tree.map(jnp.mean, metrics)}
            nr_update_iteration = (
                eval_save_iteration_step
                * self.nr_loggings_per_eval_save_iteration
                * self.nr_updates_per_logging_iteration
            ) + (logging_iteration_step + 1) * self.nr_updates_per_logging_iteration
            jax.debug.callback(self._log_train_callback, combined, nr_update_iteration, logging_iteration_step)
        return carry, None

    def _eval_iteration(self, policy_state, key, eval_save_iteration_step):
        def single_eval_step(carry, _):
            policy_state, eval_env_state = carry
            mean, _ = self.policy.apply(policy_state.params, eval_env_state.observation)
            eval_env_state = self.eval_env.step(eval_env_state, self.process_action(jnp.tanh(mean)))
            return (policy_state, eval_env_state), None

        eval_env_state = self.eval_env.reset(key, eval_mode=True)
        eval_env_state = mesh_lib.shard_batch(eval_env_state, self.mesh)
        (_, eval_env_state), _ = jax.lax.scan(
            single_eval_step, (policy_state, eval_env_state), None, self.horizon
        )
        eval_metrics = {
            "eval/episode_return": jnp.mean(eval_env_state.info["rollout/episode_return"]),
            "eval/episode_length": jnp.mean(eval_env_state.info["rollout/episode_length"]),
        }
        jax.debug.callback(self._log_eval_callback, eval_metrics, eval_save_iteration_step)

    def build_train_function(self):
        def jitable_train_function(key):
            key, reset_key = jax.random.split(key)
            env_state = self.train_env.reset(reset_key, eval_mode=False)
            env_state = mesh_lib.shard_batch(env_state, self.mesh)
            buffer = self._make_buffer()

            # Prefill with uniform random actions (normalized to [-1, 1]).
            def prefill_step(carry, _):
                env_state, buffer, key = carry
                key, sample_key = jax.random.split(key)
                action = jax.random.uniform(
                    sample_key, (self.nr_envs, self.action_dim), minval=-1.0, maxval=1.0
                )
                observation = env_state.observation
                env_state = self.train_env.step(env_state, self.process_action(action))
                buffer = self._store_step(buffer, observation, action, env_state)
                return (env_state, buffer, key), None

            if self.prefill_iterations > 0:
                (env_state, buffer, key), _ = jax.lax.scan(
                    prefill_step, (env_state, buffer, key), None, self.prefill_iterations
                )

            def eval_save_iteration(carry, eval_save_iteration_step):
                policy_state, critic_state, alpha_state, buffer, env_state, key = carry
                key, learn_key, eval_key = jax.random.split(key, 3)
                (policy_state, critic_state, alpha_state, buffer, env_state, _), _ = jax.lax.scan(
                    partial(self._logging_iteration, eval_save_iteration_step=eval_save_iteration_step),
                    (policy_state, critic_state, alpha_state, buffer, env_state, learn_key),
                    jnp.arange(self.nr_loggings_per_eval_save_iteration),
                )
                if self.evaluation_active:
                    self._eval_iteration(policy_state, eval_key, eval_save_iteration_step)
                if self.save_model:
                    jax.debug.callback(self._save_callback, policy_state, critic_state, alpha_state)
                return (policy_state, critic_state, alpha_state, buffer, env_state, key), None

            final_carry, _ = jax.lax.scan(
                eval_save_iteration,
                (self.policy_state, self.critic_state, self.entropy_coefficient_state, buffer, env_state, key),
                jnp.arange(self.nr_eval_save_iterations),
            )
            return final_carry[0], final_carry[1], final_carry[2]

        return jitable_train_function

    def train(self):
        train_function = jax.jit(self.build_train_function())
        self.key, run_key = jax.random.split(self.key)
        self._last_log_time = time.time()
        start = time.time()
        policy_state, critic_state, alpha_state = jax.block_until_ready(train_function(run_key))
        self.policy_state = policy_state
        self.critic_state = critic_state
        self.entropy_coefficient_state = alpha_state
        rlx_logger.info(f"Average time: {time.time() - start:.2f} s")

    # ------------------------------------------------------------- callbacks

    def _log_train_callback(self, metrics, nr_update_iteration, logging_iteration_step):
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        now = time.time()
        metrics["time/sps"] = int(
            self.nr_envs * self.nr_updates_per_logging_iteration / max(now - self._last_log_time, 1e-9)
        )
        self._last_log_time = now
        global_step = int(np.asarray(nr_update_iteration)) * self.nr_envs
        metrics["steps/nr_env_steps"] = global_step
        metrics["steps/nr_updates"] = int(np.asarray(nr_update_iteration))
        is_last = self.evaluation_active and (
            int(np.asarray(logging_iteration_step)) + 1 == self.nr_loggings_per_eval_save_iteration
        )
        self.logger.log_dict(metrics, global_step, wandb_commit=not is_last)

    def _log_eval_callback(self, metrics, eval_save_iteration_step):
        global_step = int((np.asarray(eval_save_iteration_step) + 1) * self.eval_save_frequency)
        self.logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, global_step)

    def _save_callback(self, policy_state, critic_state, alpha_state):
        ckpt.save_model_file(
            self.save_path,
            "latest.model",
            {
                "policy": policy_state.params,
                "critic": critic_state.params,
                "critic_target": critic_state.target_params,
                "entropy_coefficient": alpha_state.params,
            },
            self.config.algorithm.to_dict(),
        )

    def save(self):
        self._save_callback(self.policy_state, self.critic_state, self.entropy_coefficient_state)

    @staticmethod
    def load(config, train_env, eval_env, run_path, writer, explicitly_set_algorithm_params):
        restored, loaded_config = ckpt.load_model_file(config.runner.load_model)
        ckpt.merge_loaded_algorithm_config(config, loaded_config, explicitly_set_algorithm_params)
        model = SAC(config, train_env, eval_env, run_path, writer)
        target = {
            "policy": model.policy_state.params,
            "critic": model.critic_state.params,
            "critic_target": model.critic_state.target_params,
            "entropy_coefficient": model.entropy_coefficient_state.params,
        }
        restored, _ = ckpt.load_model_file(config.runner.load_model, target)
        model.policy_state = model.policy_state.replace(params=restored["policy"])
        model.critic_state = model.critic_state.replace(
            params=restored["critic"], target_params=restored["critic_target"]
        )
        model.entropy_coefficient_state = model.entropy_coefficient_state.replace(
            params=restored["entropy_coefficient"]
        )
        return model

    def test(self, episodes):
        @jax.jit
        def rollout(env_state):
            mean, _ = self.policy.apply(self.policy_state.params, env_state.observation)
            return self.eval_env.step(env_state, self.process_action(jnp.tanh(mean)))

        self.key, reset_key = jax.random.split(self.key)
        env_state = self.eval_env.reset(reset_key, eval_mode=True)
        returns = []
        for _ in range(episodes):
            for _ in range(self.horizon):
                env_state = rollout(env_state)
            returns.append(float(jnp.mean(env_state.info["rollout/episode_return"])))
            rlx_logger.info(f"eval/episode_return: {returns[-1]:.2f}")
        return returns

    def general_properties():
        return GeneralProperties
