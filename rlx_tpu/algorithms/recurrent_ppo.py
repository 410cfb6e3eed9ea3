"""Shared recurrent-PPO training program (LSTM/GRU memory variants).

Parity with `rl_x/algorithms/ppo_lstm/flax_full_jit/ppo_lstm.py:114-348` and
the GRU twin: PPO whose policy carries a recurrent state through the rollout —

- the carry is zeroed per env when an episode ends during the rollout
  (`ppo_lstm.py:148-149`);
- the carry at the START of each rollout window is saved and re-fed per
  minibatch (`ppo_lstm.py:162,249`);
- minibatches are over ENVS with the time axis intact (`ppo_lstm.py:230-263`)
  so BPTT sequences stay contiguous;
- the loss re-runs the policy over the stored [T, E_mb] window with
  done-masked carry resets (`policy.py:126-143`).

Critic stays feedforward, as in the reference.  The env axis shards over
the mesh dp axis; the time scan stays fused inside the one XLA program.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from rlx_tpu.models import distributions as D
from rlx_tpu.models.mlp import VCritic, get_processed_action_function
from rlx_tpu.models.recurrent import RecurrentPolicy, mask_carry
from rlx_tpu.algorithms.training_program import run_training_program
from rlx_tpu.ops.gae import gae_advantages
from rlx_tpu.parallel import mesh as mesh_lib
from rlx_tpu.utils import checkpoint as ckpt
from rlx_tpu.utils.logging import MetricsLogger, rlx_logger


class RecurrentPPO:
    cell_type = "lstm"  # overridden by registered subclasses

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
        self.nr_steps = a.nr_steps
        self.nr_epochs = a.nr_epochs
        self.nr_minibatches = a.nr_minibatches
        self.gamma = a.gamma
        self.gae_lambda = a.gae_lambda
        self.clip_range = a.clip_range
        self.entropy_coef = a.entropy_coef
        self.critic_coef = a.critic_coef
        self.max_grad_norm = a.max_grad_norm
        self.evaluation_active = a.evaluation_active

        # Parallel seeds: the reference plumbs this through ppo_lstm's
        # full_jit too (`ppo_lstm/flax_full_jit/ppo_lstm.py` caps it at 1);
        # here the whole program vmaps over seeds (same rules as ppo.py:74-88)
        self.nr_parallel_seeds = int(getattr(a, "nr_parallel_seeds", 1))
        if self.nr_parallel_seeds > 1 and (a.logging_active or self.save_model):
            raise ValueError(
                "nr_parallel_seeds > 1 requires algorithm.logging_active=False "
                "and runner.save_model=False (callbacks cannot run under vmap); "
                "results are recorded per-seed in eval_history"
            )
        if self.nr_parallel_seeds > 1 and config.runner.chunked_train:
            raise ValueError(
                "nr_parallel_seeds > 1 runs one fused vmapped program and cannot "
                "honor runner.chunked_train (bounded per-call device executions); "
                "run seeds separately or disable chunked_train"
            )

        self.batch_size = self.nr_envs * self.nr_steps
        self.nr_updates = max(self.total_timesteps // self.batch_size, 1)
        self.nr_minibatch_envs = self.nr_envs // self.nr_minibatches
        self.eval_save_frequency = a.evaluation_and_save_frequency
        if self.eval_save_frequency == -1:
            self.eval_save_frequency = self.batch_size * self.nr_updates
        self.nr_eval_save_iterations = max(self.total_timesteps // self.eval_save_frequency, 1)
        self.nr_updates_per_eval_save_iteration = self.eval_save_frequency // self.batch_size

        self.horizon = train_env.horizon
        self.os_shape = train_env.single_observation_space.shape
        self.as_shape = train_env.single_action_space.shape
        self.action_dim = int(np.prod(self.as_shape))

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

        self.policy = RecurrentPolicy(
            action_dim=self.action_dim,
            cell_type=self.cell_type,
            std_dev=a.std_dev,
            obs_encoding_dim=a.obs_encoding_dim,
            hidden_dim=a.rnn_hidden_dim,
            combine_method=a.rnn_obs_combine_method,
            share_encoder=a.share_rnn_obs_encoder,
            observation_indices=getattr(train_env, "policy_observation_indices", None),
            cell_state_dim=getattr(a, "cell_state_dim", 16),
            cell_conv_kernel=getattr(a, "cell_conv_kernel", 4),
            cell_context_len=getattr(a, "tf_context_len", 16),
            cell_nr_heads=getattr(a, "tf_nr_heads", 4),
            cell_nr_blocks=getattr(a, "tf_nr_blocks", 2),
        )
        self.critic = VCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            observation_indices=getattr(train_env, "critic_observation_indices", None),
        )
        self.process_action = get_processed_action_function(
            a.action_clipping_and_rescaling,
            train_env.single_action_space.low,
            train_env.single_action_space.high,
        )

        def linear_schedule(count):
            fraction = 1.0 - (count // (self.nr_minibatches * self.nr_epochs)) / self.nr_updates
            return self.learning_rate * fraction

        lr = linear_schedule if self.anneal_learning_rate else self.learning_rate

        def make_tx():
            return optax.chain(
                optax.clip_by_global_norm(self.max_grad_norm),
                optax.inject_hyperparams(optax.adam)(learning_rate=lr),
            )

        self._make_tx = make_tx
        self.policy_state, self.critic_state = self._make_train_states(policy_key, critic_key)
        repl = mesh_lib.replicated_sharding(self.mesh)
        self.policy_state = jax.device_put(self.policy_state, repl)
        self.critic_state = jax.device_put(self.critic_state, repl)
        self._last_log_time = time.time()

    def _make_train_states(self, policy_key, critic_key):
        """Jittable per-seed network/optimizer init (vmapped by
        ``_train_parallel_seeds``; called eagerly for single-seed runs)."""
        dummy_obs = jnp.zeros((self.nr_envs,) + self.os_shape, jnp.float32)
        dummy_carry = self.policy.initialize_carry(self.nr_envs)
        policy_state = TrainState.create(
            apply_fn=self.policy.apply,
            params=self.policy.init(policy_key, dummy_obs, dummy_carry, method=self.policy.one_step),
            tx=self._make_tx(),
        )
        critic_state = TrainState.create(
            apply_fn=self.critic.apply,
            params=self.critic.init(critic_key, dummy_obs),
            tx=self._make_tx(),
        )
        return policy_state, critic_state

    # ----------------------------------------------------------------- train

    def _learning_iteration(self, carry, learning_iteration_step, outer_step):
        policy_state, critic_state, env_state, policy_carry, key = carry
        rollout_init_carry = policy_carry

        def single_rollout_step(rollout_carry, _):
            policy_state, critic_state, env_state, policy_carry, key = rollout_carry
            key, action_key = jax.random.split(key)
            observation = env_state.observation
            mean, logstd, next_carry = self.policy.apply(
                policy_state.params, observation, policy_carry, method=self.policy.one_step
            )
            action = D.gaussian_sample(action_key, mean, logstd)
            log_prob = D.gaussian_log_prob(mean, logstd, action)
            value = self.critic.apply(critic_state.params, observation).squeeze(-1)
            env_state = self.train_env.step(env_state, self.process_action(action))
            done = env_state.terminated | env_state.truncated
            next_carry = mask_carry(next_carry, done)
            transition = (
                observation, env_state.final_observation, action, env_state.reward,
                value, env_state.terminated, done, log_prob, env_state.info,
            )
            return (policy_state, critic_state, env_state, next_carry, key), transition

        (policy_state, critic_state, env_state, policy_carry, key), batch = jax.lax.scan(
            single_rollout_step,
            (policy_state, critic_state, env_state, policy_carry, key),
            None,
            self.nr_steps,
        )
        observations, final_observations, actions, rewards, values, terminations, dones, log_probs, infos = batch

        next_values = self.critic.apply(critic_state.params, final_observations).squeeze(-1)
        advantages, returns = gae_advantages(
            rewards, values, next_values, terminations, self.gamma, self.gae_lambda
        )

        dones = dones.astype(jnp.float32)

        def loss_fn(policy_params, critic_params, obs_seq, action_seq, log_prob_seq,
                    return_seq, advantage_seq, done_seq, init_carry):
            mean_seq, logstd_seq = self.policy.apply(
                policy_params, obs_seq, done_seq, init_carry, method=self.policy.sequence
            )
            new_log_prob = D.gaussian_log_prob(mean_seq, logstd_seq, action_seq)
            entropy = jnp.broadcast_to(D.gaussian_entropy(logstd_seq), new_log_prob.shape)

            logratio = new_log_prob - log_prob_seq
            ratio = jnp.exp(logratio)
            approx_kl = ((ratio - 1.0) - logratio).mean()
            clip_fraction = (jnp.abs(ratio - 1.0) > self.clip_range).mean()

            pg_loss1 = -advantage_seq * ratio
            pg_loss2 = -advantage_seq * jnp.clip(ratio, 1.0 - self.clip_range, 1.0 + self.clip_range)
            pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()
            entropy_loss = entropy.mean()

            new_value = self.critic.apply(critic_params, obs_seq).squeeze(-1)
            critic_loss = (0.5 * (new_value - return_seq) ** 2).mean()

            loss = pg_loss - self.entropy_coef * entropy_loss + self.critic_coef * critic_loss
            metrics = {
                "loss/policy_gradient_loss": pg_loss,
                "loss/critic_loss": critic_loss,
                "loss/entropy_loss": entropy_loss,
                "policy_ratio/approx_kl": approx_kl,
                "policy_ratio/clip_fraction": clip_fraction,
            }
            return loss, metrics

        grad_loss_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        # Minibatches over ENVS, time axis intact (`ppo_lstm.py:230-241`).
        key, perm_key = jax.random.split(key)
        env_indices = jnp.tile(jnp.arange(self.nr_envs), (self.nr_epochs, 1))
        env_indices = jax.random.permutation(perm_key, env_indices, axis=1, independent=True)
        env_indices = env_indices.reshape((self.nr_epochs * self.nr_minibatches, self.nr_minibatch_envs))

        def minibatch_update(carry, minibatch_env_indices):
            policy_state, critic_state = carry
            mb_advantages = advantages[:, minibatch_env_indices]
            mb_advantages = (mb_advantages - mb_advantages.mean()) / (mb_advantages.std() + 1e-8)
            (loss, metrics), (policy_grads, critic_grads) = grad_loss_fn(
                policy_state.params,
                critic_state.params,
                observations[:, minibatch_env_indices],
                actions[:, minibatch_env_indices],
                log_probs[:, minibatch_env_indices],
                returns[:, minibatch_env_indices],
                mb_advantages,
                dones[:, minibatch_env_indices],
                jax.tree.map(lambda c: c[minibatch_env_indices], rollout_init_carry),
            )
            policy_state = policy_state.apply_gradients(grads=policy_grads)
            critic_state = critic_state.apply_gradients(grads=critic_grads)
            metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
            metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
            return (policy_state, critic_state), metrics

        (policy_state, critic_state), metrics = jax.lax.scan(
            minibatch_update, (policy_state, critic_state), env_indices
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["lr/learning_rate"] = policy_state.opt_state[1].hyperparams["learning_rate"]
        metrics["v_value/explained_variance"] = 1.0 - jnp.var(returns - values) / (jnp.var(returns) + 1e-8)
        metrics["policy/std_dev"] = jnp.mean(jnp.exp(policy_state.params["params"]["policy_logstd"]))

        if self.config.algorithm.logging_active:
            combined = {**jax.tree.map(jnp.mean, infos), **metrics}
            combined_step = outer_step * self.nr_updates_per_eval_save_iteration + learning_iteration_step + 1
            jax.debug.callback(self._log_train_callback, combined, combined_step, learning_iteration_step)

        return (policy_state, critic_state, env_state, policy_carry, key), None

    def _eval_iteration(self, policy_state, key, outer_step):
        def single_eval_step(carry, _):
            policy_state, eval_env_state, policy_carry = carry
            mean, _, next_carry = self.policy.apply(
                policy_state.params, eval_env_state.observation, policy_carry,
                method=self.policy.one_step,
            )
            eval_env_state = self.eval_env.step(eval_env_state, self.process_action(mean))
            done = eval_env_state.terminated | eval_env_state.truncated
            next_carry = mask_carry(next_carry, done)
            return (policy_state, eval_env_state, next_carry), None

        eval_env_state = self.eval_env.reset(key, eval_mode=True)
        eval_env_state = mesh_lib.shard_batch(eval_env_state, self.mesh)
        carry = self.policy.initialize_carry(self.nr_envs)
        (_, eval_env_state, _), _ = jax.lax.scan(
            single_eval_step, (policy_state, eval_env_state, carry), None, self.horizon
        )
        # every rollout/ info key becomes an eval metric (episode return/
        # length everywhere; episode_tracking on the locomotion family)
        eval_metrics = {
            "eval/" + k.split("rollout/", 1)[1]: jnp.mean(v)
            for k, v in eval_env_state.info.items()
            if k.startswith("rollout/")
        }
        if self.config.algorithm.logging_active:
            combined_step = (outer_step + 1) * self.nr_updates_per_eval_save_iteration
            jax.debug.callback(self._log_eval_callback, eval_metrics, combined_step)
        return eval_metrics

    def _eval_save_iteration(self, carry, outer_step):
        """One eval/save iteration: a block of learning iterations followed by
        an optional eval rollout and checkpoint callback.  Used both as a
        `lax.scan` body (fused mode) and as a standalone jitted step
        (`runner.chunked_train` host loop)."""
        policy_state, critic_state, env_state, policy_carry, key, best_return = carry
        key, learn_key, eval_key = jax.random.split(key, 3)
        (policy_state, critic_state, env_state, policy_carry, _), _ = jax.lax.scan(
            partial(self._learning_iteration, outer_step=outer_step),
            (policy_state, critic_state, env_state, policy_carry, learn_key),
            jnp.arange(self.nr_updates_per_eval_save_iteration),
        )
        eval_metrics = None
        is_best = jnp.asarray(False)
        if self.evaluation_active:
            eval_metrics = self._eval_iteration(policy_state, eval_key, outer_step)
            is_best = eval_metrics["eval/episode_return"] > best_return
            best_return = jnp.maximum(best_return, eval_metrics["eval/episode_return"])
        if self.save_model:
            jax.debug.callback(self._save_callback, policy_state, critic_state, is_best)
        return (policy_state, critic_state, env_state, policy_carry, key, best_return), eval_metrics

    def _init_train_carry(self, key, states=None):
        policy_state, critic_state = (
            (self.policy_state, self.critic_state) if states is None else states
        )
        key, reset_key = jax.random.split(key)
        env_state = self.train_env.reset(reset_key, eval_mode=False)
        env_state = mesh_lib.shard_batch(env_state, self.mesh)
        policy_carry = self.policy.initialize_carry(self.nr_envs)
        return (policy_state, critic_state, env_state, policy_carry, key, -jnp.inf)

    def build_train_function(self):
        def jitable_train_function(key):
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key),
                jnp.arange(self.nr_eval_save_iterations),
            )

        return jitable_train_function

    def _record_eval_history(self, eval_history):
        # callback-free curve record (see ppo.py train())
        self.eval_history = None
        if eval_history is not None:
            steps = (np.arange(self.nr_eval_save_iterations) + 1) * self.nr_updates_per_eval_save_iteration * self.batch_size
            self.eval_history = {"steps": steps}
            self.eval_history.update({k: np.asarray(v) for k, v in eval_history.items()})

    def _train_parallel_seeds(self, run_key):
        """vmap the ENTIRE training program (net init + env reset + train
        scan) over ``nr_parallel_seeds`` independent seeds on one chip
        (ppo.py:_train_parallel_seeds pattern; the reference caps this at 1).
        Returns (first-seed states, eval_history with a leading seed axis)."""

        def per_seed(key):
            key, init_key = jax.random.split(key)
            policy_key, critic_key = jax.random.split(init_key)
            states = self._make_train_states(policy_key, critic_key)
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key, states),
                jnp.arange(self.nr_eval_save_iterations),
            )

        seed_keys = jax.random.split(run_key, self.nr_parallel_seeds)
        carries, eval_history = jax.block_until_ready(
            jax.jit(jax.vmap(per_seed))(seed_keys)
        )
        first = jax.tree.map(lambda x: x[0], (carries[0], carries[1]))
        return first, eval_history

    def train(self):
        self.key, run_key = jax.random.split(self.key)
        self._last_log_time = time.time()
        start = time.time()
        if self.nr_parallel_seeds > 1:
            (self.policy_state, self.critic_state), eval_history = (
                self._train_parallel_seeds(run_key)
            )
        else:
            carry, eval_history = run_training_program(self, run_key)
            self.policy_state, self.critic_state = carry[0], carry[1]
        self._record_eval_history(eval_history)
        rlx_logger.info(f"Average time: {time.time() - start:.2f} s")

    # ------------------------------------------------------------- callbacks

    def _log_train_callback(self, metrics, combined_step, learning_iteration_step):
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        now = time.time()
        metrics["time/sps"] = int(self.batch_size / max(now - self._last_log_time, 1e-9))
        self._last_log_time = now
        global_step = int(np.asarray(combined_step)) * self.batch_size
        metrics["steps/nr_env_steps"] = global_step
        metrics["steps/nr_updates"] = int(np.asarray(combined_step)) * self.nr_epochs * self.nr_minibatches
        is_last = self.evaluation_active and (
            int(np.asarray(learning_iteration_step)) + 1 == self.nr_updates_per_eval_save_iteration
        )
        self.logger.log_dict(metrics, global_step, wandb_commit=not is_last)

    def _log_eval_callback(self, metrics, combined_step):
        global_step = int(np.asarray(combined_step)) * self.batch_size
        self.logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, global_step)

    def _save_callback(self, policy_state, critic_state, is_best=False):
        names = ["latest.model"] + (["best.model"] if bool(np.asarray(is_best)) else [])
        for name in names:
            ckpt.save_model_file(
                self.save_path, name,
                {"policy": policy_state.params, "critic": critic_state.params},
                self.config.algorithm.to_dict(),
            )

    def save(self):
        self._save_callback(self.policy_state, self.critic_state)

    @classmethod
    def load(cls, config, train_env, eval_env, run_path, writer, explicitly_set_algorithm_params):
        restored, loaded_config = ckpt.load_model_file(config.runner.load_model)
        ckpt.merge_loaded_algorithm_config(config, loaded_config, explicitly_set_algorithm_params)
        model = cls(config, train_env, eval_env, run_path, writer)
        target = {"policy": model.policy_state.params, "critic": model.critic_state.params}
        restored, _ = ckpt.load_model_file(config.runner.load_model, target)
        model.policy_state = model.policy_state.replace(params=restored["policy"])
        model.critic_state = model.critic_state.replace(params=restored["critic"])
        return model

    def test(self, episodes):
        @jax.jit
        def rollout(env_state, policy_carry):
            mean, _, next_carry = self.policy.apply(
                self.policy_state.params, env_state.observation, policy_carry,
                method=self.policy.one_step,
            )
            env_state = self.eval_env.step(env_state, self.process_action(mean))
            done = env_state.terminated | env_state.truncated
            next_carry = mask_carry(next_carry, done)
            return env_state, next_carry

        from rlx_tpu.algorithms.evaluation import collect_test_returns

        self.key, reset_key = jax.random.split(self.key)
        env_state = self.eval_env.reset(reset_key, eval_mode=True)
        carry = self.policy.initialize_carry(self.nr_envs)
        return collect_test_returns(
            lambda c: rollout(*c), (env_state, carry), episodes, self.horizon,
            extract=lambda c: c[0],
        )
