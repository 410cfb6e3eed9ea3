"""PPO as ONE fused XLA program over a device mesh — the flagship algorithm.

Capability parity with `rl_x/algorithms/ppo/flax_full_jit/ppo.py:114-348`
(whole training run inside a single jit: rollout scan -> GAE reverse scan ->
per-epoch independently-permuted minibatch update scan -> eval/save/log
cadence scans, host reached only through debug callbacks), redesigned for
TPU:

- the env-batch axis is sharded over the mesh "dp" axis (the reference is
  single-device, SURVEY.md §2.5); gradients are reduced over dp by XLA's
  sharding propagation — no explicit pmap/psum code.
- batched-native env stepping (see rlx_tpu.environments.env).
- optional tensor-parallel params over the "tp" axis.
- losses are computed batched (mathematically identical to the reference's
  vmap-then-tree-mean at `ppo/flax_full_jit/ppo.py:223-226`).

Curve-parity details kept exactly: per-epoch independent permutations
(`ppo.py:229-231`), per-minibatch advantage normalization (`ppo.py:236-237`),
LR annealing keyed on optimizer step count (`ppo.py:82-84`),
clip+adam optax chain with inject_hyperparams (`ppo.py:93-96`).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from rlx_tpu.algorithms.training_program import run_training_program
from rlx_tpu.algorithms.ppo.tpu.general_properties import GeneralProperties
from rlx_tpu.environments.types import ActionSpaceType
from rlx_tpu.models.policy_factory import make_critic, make_policy
from rlx_tpu.ops.gae import gae_advantages
from rlx_tpu.parallel import mesh as mesh_lib
from rlx_tpu.utils import checkpoint as ckpt
from rlx_tpu.utils.logging import MetricsLogger, rlx_logger


class PPO:
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
        self.minibatch_size = a.minibatch_size
        self.gamma = a.gamma
        self.gae_lambda = a.gae_lambda
        self.clip_range = a.clip_range
        self.entropy_coef = a.entropy_coef
        self.critic_coef = a.critic_coef
        self.max_grad_norm = a.max_grad_norm
        self.evaluation_active = a.evaluation_active

        # Parallel seeds: the reference CAPS this at 1 (`ppo/flax_full_jit/
        # ppo.py:70-71` — per-run logging conflicts with vmap).  Here the
        # whole training program (net init + env reset + train scan) vmaps
        # over a seed axis on one chip — a TPU-native capability the
        # reference doesn't have.  Logging/checkpoint callbacks cannot run
        # under vmap, so those must be off.
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
        self.nr_updates = self.total_timesteps // self.batch_size
        self.nr_minibatches = self.batch_size // self.minibatch_size
        self.eval_save_frequency = a.evaluation_and_save_frequency
        if self.eval_save_frequency == -1:
            self.eval_save_frequency = self.batch_size * max(self.nr_updates, 1)
        if self.eval_save_frequency % self.batch_size != 0:
            raise ValueError("evaluation_and_save_frequency must be a multiple of nr_envs * nr_steps")
        self.nr_eval_save_iterations = max(self.total_timesteps // self.eval_save_frequency, 1)
        self.nr_updates_per_eval_save_iteration = self.eval_save_frequency // self.batch_size

        self.horizon = train_env.horizon
        self.os_shape = train_env.single_observation_space.shape
        self.as_shape = train_env.single_action_space.shape
        self.continuous = (
            train_env.general_properties.action_space_type == ActionSpaceType.CONTINUOUS
        )

        self.mesh = mesh_lib.make_mesh(
            dp=(None if config.runner.mesh_dp == -1 else config.runner.mesh_dp),
            tp=config.runner.mesh_tp,
        )
        if self.nr_envs % self.mesh.shape[mesh_lib.DP_AXIS] != 0:
            raise ValueError("nr_envs must be divisible by the dp mesh axis size")
        self.dp_size = self.mesh.shape[mesh_lib.DP_AXIS]
        # Shard-local minibatching keeps every per-minibatch gather on its own
        # device (no all-to-all); at dp=1 it is exactly the reference's global
        # permutation. Falls back to global gathers when sizes don't divide.
        self.shard_local_minibatching = (
            getattr(a, "shard_local_minibatching", True)
            and self.dp_size > 1
            and self.batch_size % self.dp_size == 0
            and self.minibatch_size % self.dp_size == 0
        )

        self.logger = MetricsLogger(
            config.runner.track_console, config.runner.track_tb, config.runner.track_wandb, writer
        )

        rlx_logger.info(f"Using device: {jax.default_backend()}, mesh: {dict(self.mesh.shape)}")

        self.key = jax.random.PRNGKey(self.seed)
        self.key, policy_key, critic_key = jax.random.split(self.key, 3)

        self.policy = make_policy(config, train_env)
        self.critic = make_critic(config, train_env)

        def linear_schedule(count):
            fraction = 1.0 - (count // (self.nr_minibatches * self.nr_epochs)) / max(self.nr_updates, 1)
            return self.learning_rate * fraction

        learning_rate = linear_schedule if self.anneal_learning_rate else self.learning_rate

        def make_tx():
            return optax.chain(
                optax.clip_by_global_norm(self.max_grad_norm),
                optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
            )

        def make_train_states(policy_key, critic_key):
            dummy_obs = jnp.zeros((1,) + self.os_shape, dtype=jnp.float32)
            policy_state = TrainState.create(
                apply_fn=self.policy.module.apply,
                params=self.policy.module.init(policy_key, dummy_obs),
                tx=make_tx(),
            )
            critic_state = TrainState.create(
                apply_fn=self.critic.apply,
                params=self.critic.init(critic_key, dummy_obs),
                tx=make_tx(),
            )
            return policy_state, critic_state

        self._make_train_states = make_train_states  # jittable (parallel seeds)
        self.policy_state, self.critic_state = make_train_states(policy_key, critic_key)
        # Place training state on the mesh: replicated on a pure-dp mesh;
        # Dense kernels (and their adam moments) sharded over tp when tp > 1.
        if self.mesh.shape[mesh_lib.TP_AXIS] > 1:
            from rlx_tpu.parallel.partition import shard_tree, tp_specs_for_tree

            tp_size = self.mesh.shape[mesh_lib.TP_AXIS]
            self.policy_state = shard_tree(
                self.policy_state, self.mesh, tp_specs_for_tree(self.policy_state, tp_size)
            )
            self.critic_state = shard_tree(
                self.critic_state, self.mesh, tp_specs_for_tree(self.critic_state, tp_size)
            )
        else:
            repl = mesh_lib.replicated_sharding(self.mesh)
            self.policy_state = jax.device_put(self.policy_state, repl)
            self.critic_state = jax.device_put(self.critic_state, repl)

        self._last_log_time = time.time()

    # ------------------------------------------------------------------ train

    def _learning_iteration(self, carry, learning_iteration_step, outer_step):
        """One rollout + GAE + minibatch-epochs update. Pure; called under scan."""
        policy_state, critic_state, env_state, key = carry

        # --- rollout: lax.scan over nr_steps, env stepped on device --------
        def single_rollout_step(rollout_carry, _):
            policy_state, critic_state, env_state, key = rollout_carry
            key, action_key = jax.random.split(key)
            observation = env_state.observation
            action, log_prob = self.policy.sample_and_log_prob(
                policy_state.params, observation, action_key
            )
            env_state = self.train_env.step(env_state, self.policy.process_action(action))
            transition = (
                observation,
                env_state.final_observation,
                action,
                env_state.reward,
                env_state.terminated,
                log_prob,
                env_state.info,
            )
            return (policy_state, critic_state, env_state, key), transition

        (policy_state, critic_state, env_state, key), batch = jax.lax.scan(
            single_rollout_step, (policy_state, critic_state, env_state, key), None, self.nr_steps
        )
        observations, final_observations, actions, rewards, terminations, log_probs, infos = batch

        # --- advantages ----------------------------------------------------
        # Values are computed OUTSIDE the rollout scan in one batched call
        # over [nr_steps * nr_envs] rows: critic params are constant during
        # the rollout, so this is mathematically identical to the reference's
        # per-step critic call (`ppo/flax_full_jit/ppo.py:139`) but runs one
        # MXU-sized matmul instead of nr_steps small ones.
        values = self.critic.apply(critic_state.params, observations).squeeze(-1)
        next_values = self.critic.apply(critic_state.params, final_observations).squeeze(-1)
        advantages, returns = gae_advantages(
            rewards, values, next_values, terminations, self.gamma, self.gae_lambda
        )

        # --- flatten + shard the update batch over dp ----------------------
        # Shard-local minibatching flattens env-major so the merged axis stays
        # contiguous per dp shard (the rollout's env axis is the sharded one);
        # otherwise keep the reference's step-major flatten for curve parity.
        if self.shard_local_minibatching:
            flat = lambda x: jnp.swapaxes(x, 0, 1).reshape((-1,) + x.shape[2:])
        else:
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch_observations = flat(observations)
        batch_actions = flat(actions)
        batch_advantages = flat(advantages)
        batch_returns = flat(returns)
        batch_log_probs = flat(log_probs)
        batch_observations = mesh_lib.shard_batch(batch_observations, self.mesh)

        key, opt_key = jax.random.split(key)
        policy_state, critic_state, optimization_metrics = self._optimize(
            policy_state, critic_state,
            (batch_observations, batch_actions, batch_log_probs, batch_returns, batch_advantages),
            opt_key,
        )
        optimization_metrics["v_value/explained_variance"] = 1.0 - jnp.var(returns - values) / (
            jnp.var(returns) + 1e-8
        )
        if self.continuous:
            optimization_metrics["policy/std_dev"] = jnp.mean(
                jnp.exp(policy_state.params["params"]["policy_logstd"])
            )

        # --- logging escape ------------------------------------------------
        if self.config.algorithm.logging_active:
            combined_metrics = {**jax.tree.map(jnp.mean, infos), **optimization_metrics}
            combined_step = outer_step * self.nr_updates_per_eval_save_iteration + learning_iteration_step + 1
            jax.debug.callback(
                self._log_train_callback, combined_metrics, combined_step, learning_iteration_step
            )

        return (policy_state, critic_state, env_state, key), None

    def _loss_fn(self, policy_params, critic_params, obs_mb, action_mb, log_prob_mb, return_mb, advantage_mb):
            new_log_prob, entropy = self.policy.log_prob_entropy(policy_params, obs_mb, action_mb)
            logratio = new_log_prob - log_prob_mb
            ratio = jnp.exp(logratio)
            approx_kl = ((ratio - 1.0) - logratio).mean()
            clip_fraction = (jnp.abs(ratio - 1.0) > self.clip_range).mean()

            pg_loss1 = -advantage_mb * ratio
            pg_loss2 = -advantage_mb * jnp.clip(ratio, 1.0 - self.clip_range, 1.0 + self.clip_range)
            pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()

            entropy_loss = entropy.mean()

            new_value = self.critic.apply(critic_params, obs_mb).squeeze(-1)
            critic_loss = (0.5 * (new_value - return_mb) ** 2).mean()

            loss = pg_loss - self.entropy_coef * entropy_loss + self.critic_coef * critic_loss
            metrics = {
                "loss/policy_gradient_loss": pg_loss,
                "loss/critic_loss": critic_loss,
                "loss/entropy_loss": entropy_loss,
                "policy_ratio/approx_kl": approx_kl,
                "policy_ratio/clip_fraction": clip_fraction,
            }
            return loss, metrics

    def _optimize(self, policy_state, critic_state, batch_arrays, key):
        """Minibatch-epochs PPO-Clip optimization (overridable: ESPO swaps in
        early-stopped whole-batch epochs).

        Permutation semantics are reference-exact: per-epoch independent
        permutations (`ppo/flax_full_jit/ppo.py:229-231`).  With shard-local
        minibatching each dp shard permutes its own slice of the batch and
        every minibatch takes an equal cut from each shard, so no gather ever
        crosses devices (at dp=1 both paths coincide with the reference).

        TPU layout: the five update arrays are packed into ONE [B, D] matrix
        and each epoch's permutation is applied as a single row gather, after
        which minibatches are contiguous slices consumed by ``lax.scan``.
        Per-minibatch gathers of five separate arrays (three of them
        scalar-row, i.e. 4-byte random accesses) cost 46.8 of the 93.5 ms
        update phase on a v5e chip — packing removes ~45 ms/iteration
        (measured by benchmarks/profile_update.py).  Minibatch contents and
        order are bit-identical to the per-minibatch-gather formulation.
        """
        batch_observations, batch_actions, batch_log_probs, batch_returns, batch_advantages = batch_arrays
        grad_loss_fn = jax.value_and_grad(self._loss_fn, argnums=(0, 1), has_aux=True)

        key, perm_key = jax.random.split(key)
        dp = self.dp_size
        if self.shard_local_minibatching:
            rows_per_shard = self.batch_size // dp
            mb_local = self.minibatch_size // dp
            epoch_indices = jnp.tile(jnp.arange(rows_per_shard), (self.nr_epochs, dp, 1))
            epoch_indices = jax.random.permutation(perm_key, epoch_indices, axis=-1, independent=True)
        else:
            epoch_indices = jnp.tile(jnp.arange(self.batch_size), (self.nr_epochs, 1))
            epoch_indices = jax.random.permutation(perm_key, epoch_indices, axis=1, independent=True)

        # --- pack [obs | action | log_prob | return | advantage] -----------
        obs_dim = batch_observations.shape[-1] if batch_observations.ndim == 2 else None
        packable = batch_observations.ndim == 2  # vision keeps per-mb gathers
        if packable:
            action_2d = batch_actions.reshape(self.batch_size, -1)
            action_cols = action_2d.shape[1]
            action_dtype = batch_actions.dtype
            packed = jnp.concatenate(
                [
                    batch_observations,
                    action_2d.astype(batch_observations.dtype),
                    batch_log_probs[:, None],
                    batch_returns[:, None],
                    batch_advantages[:, None],
                ],
                axis=1,
            )
            packed = mesh_lib.shard_batch(packed, self.mesh)
            D = packed.shape[1]

            def unpack(mb):
                o = mb[:, :obs_dim]
                a = mb[:, obs_dim:obs_dim + action_cols].astype(action_dtype)
                if batch_actions.ndim == 1:  # discrete scalar actions
                    a = a.reshape(self.minibatch_size)
                lp = mb[:, obs_dim + action_cols]
                ret = mb[:, obs_dim + action_cols + 1]
                adv = mb[:, obs_dim + action_cols + 2]
                return o, a, lp, ret, adv

            def epoch_minibatches(idx_e):
                if self.shard_local_minibatching:
                    xb = packed.reshape(dp, rows_per_shard, D)
                    shuffled = jnp.take_along_axis(xb, idx_e[:, :, None], axis=1)
                    shuffled = shuffled.reshape(dp, self.nr_minibatches, mb_local, D)
                    return jnp.moveaxis(shuffled, 0, 1)  # [nr_mb, dp, mb_local, D]
                shuffled = jnp.take(packed, idx_e, axis=0)
                return shuffled.reshape(self.nr_minibatches, self.minibatch_size, D)

            def minibatch_update(carry, mb_rows):
                policy_state, critic_state = carry
                obs_mb, action_mb, log_prob_mb, return_mb, adv_mb = unpack(
                    mb_rows.reshape(self.minibatch_size, D)
                )
                adv_mb = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
                (loss, metrics), (policy_grads, critic_grads) = grad_loss_fn(
                    policy_state.params, critic_state.params,
                    obs_mb, action_mb, log_prob_mb, return_mb, adv_mb,
                )
                policy_state = policy_state.apply_gradients(grads=policy_grads)
                critic_state = critic_state.apply_gradients(grads=critic_grads)
                metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
                metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
                return (policy_state, critic_state), metrics

            def epoch_step(carry, idx_e):
                return jax.lax.scan(minibatch_update, carry, epoch_minibatches(idx_e))

            (policy_state, critic_state), optimization_metrics = jax.lax.scan(
                epoch_step, (policy_state, critic_state), epoch_indices
            )
        else:
            if self.shard_local_minibatching:
                batch_indices = epoch_indices.reshape(
                    self.nr_epochs, dp, self.nr_minibatches, mb_local
                )
                batch_indices = jnp.moveaxis(batch_indices, 1, 2).reshape(
                    (self.nr_epochs * self.nr_minibatches, dp, mb_local)
                )

                def gather(x, mb_idx):
                    xb = x.reshape((dp, rows_per_shard) + x.shape[1:])
                    ix = mb_idx.reshape((dp, mb_local) + (1,) * (x.ndim - 1))
                    return jnp.take_along_axis(xb, ix, axis=1).reshape(
                        (self.minibatch_size,) + x.shape[1:]
                    )
            else:
                batch_indices = epoch_indices.reshape(
                    (self.nr_epochs * self.nr_minibatches, self.minibatch_size)
                )

                def gather(x, mb_idx):
                    return x[mb_idx]

            def minibatch_update(carry, minibatch_indices):
                policy_state, critic_state = carry
                mb_advantages = gather(batch_advantages, minibatch_indices)
                mb_advantages = (mb_advantages - mb_advantages.mean()) / (mb_advantages.std() + 1e-8)

                (loss, metrics), (policy_grads, critic_grads) = grad_loss_fn(
                    policy_state.params,
                    critic_state.params,
                    gather(batch_observations, minibatch_indices),
                    gather(batch_actions, minibatch_indices),
                    gather(batch_log_probs, minibatch_indices),
                    gather(batch_returns, minibatch_indices),
                    mb_advantages,
                )
                policy_state = policy_state.apply_gradients(grads=policy_grads)
                critic_state = critic_state.apply_gradients(grads=critic_grads)
                metrics["gradients/policy_grad_norm"] = optax.global_norm(policy_grads)
                metrics["gradients/critic_grad_norm"] = optax.global_norm(critic_grads)
                return (policy_state, critic_state), metrics

            (policy_state, critic_state), optimization_metrics = jax.lax.scan(
                minibatch_update, (policy_state, critic_state), batch_indices
            )
        optimization_metrics = jax.tree.map(jnp.mean, optimization_metrics)
        optimization_metrics["lr/learning_rate"] = policy_state.opt_state[1].hyperparams["learning_rate"]
        return policy_state, critic_state, optimization_metrics

    def _eval_iteration(self, policy_state, key, outer_step):
        def single_eval_step(carry, _):
            policy_state, eval_env_state = carry
            action = self.policy.mode(policy_state.params, eval_env_state.observation)
            eval_env_state = self.eval_env.step(eval_env_state, self.policy.process_action(action))
            return (policy_state, eval_env_state), None

        eval_env_state = self.eval_env.reset(key, eval_mode=True)
        eval_env_state = mesh_lib.shard_batch(eval_env_state, self.mesh)
        (_, eval_env_state), _ = jax.lax.scan(
            single_eval_step, (policy_state, eval_env_state), None, self.horizon
        )
        # every rollout/ info key becomes an eval metric (episode return/
        # length everywhere; episode_tracking on the locomotion family)
        eval_metrics = {
            "eval/" + k.split("rollout/", 1)[1]: jnp.mean(v)
            for k, v in eval_env_state.info.items()
            if k.startswith("rollout/")
        }
        if self.continuous:
            # exploration-health diagnostic in the callback-free eval record
            # (the 150M locomotion anomaly hunt: does the std collapse?)
            eval_metrics["eval/policy_std"] = jnp.mean(
                jnp.exp(policy_state.params["params"]["policy_logstd"])
            )
        if self.config.algorithm.logging_active:
            combined_step = (outer_step + 1) * self.nr_updates_per_eval_save_iteration
            jax.debug.callback(self._log_eval_callback, eval_metrics, combined_step)
        return eval_metrics

    def _init_train_carry(self, key):
        key, reset_key = jax.random.split(key)
        env_state = self.train_env.reset(reset_key, eval_mode=False)
        env_state = mesh_lib.shard_batch(env_state, self.mesh)
        return (self.policy_state, self.critic_state, env_state, key, -jnp.inf)

    def build_train_function(self):
        """The whole training run as one jittable function of the seed key
        (used directly by bench.py; train() adds the chunked option)."""

        def jitable_train_function(key):
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key),
                jnp.arange(self.nr_eval_save_iterations),
            )

        return jitable_train_function

    def _eval_save_iteration(self, carry, outer_step):
        policy_state, critic_state, env_state, key, best_return = carry
        key, learn_key, eval_key = jax.random.split(key, 3)

        (policy_state, critic_state, env_state, _), _ = jax.lax.scan(
            partial(self._learning_iteration, outer_step=outer_step),
            (policy_state, critic_state, env_state, learn_key),
            jnp.arange(self.nr_updates_per_eval_save_iteration),
        )
        eval_metrics = None
        is_best = jnp.asarray(False)
        if self.evaluation_active:
            eval_metrics = self._eval_iteration(policy_state, eval_key, outer_step)
            # best-by-eval-return checkpoint (reference host loops
            # track best by running-mean return, `ppo/flax/ppo.py:350-356`)
            is_best = eval_metrics["eval/episode_return"] > best_return
            best_return = jnp.maximum(best_return, eval_metrics["eval/episode_return"])
        if self.save_model:
            jax.debug.callback(self._save_callback, policy_state, critic_state, is_best)
        return (policy_state, critic_state, env_state, key, best_return), eval_metrics

    def _train_parallel_seeds(self, run_key):
        """vmap the ENTIRE training program (net init + env reset + train
        scan) over ``nr_parallel_seeds`` independent seeds on one chip.
        Returns (first-seed carry, eval_history with a leading seed axis)."""

        def per_seed(key):
            init_key, reset_key = jax.random.split(key)
            policy_key, critic_key = jax.random.split(init_key)
            policy_state, critic_state = self._make_train_states(policy_key, critic_key)
            env_state = self.train_env.reset(reset_key, eval_mode=False)
            env_state = mesh_lib.shard_batch(env_state, self.mesh)
            carry = (policy_state, critic_state, env_state, key, -jnp.inf)
            return jax.lax.scan(
                self._eval_save_iteration, carry, jnp.arange(self.nr_eval_save_iterations)
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
        # callback-free curve record: [nr_eval_save_iterations] per metric
        # ([nr_parallel_seeds, nr_eval_save_iterations] with parallel seeds),
        # measured in-program (works where host callbacks are unavailable)
        self.eval_history = None
        if eval_history is not None:
            steps = (np.arange(self.nr_eval_save_iterations) + 1) * self.nr_updates_per_eval_save_iteration * self.batch_size
            self.eval_history = {"steps": steps}
            self.eval_history.update({k: np.asarray(v) for k, v in eval_history.items()})
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
        is_last_before_eval = self.evaluation_active and (
            int(np.asarray(learning_iteration_step)) + 1 == self.nr_updates_per_eval_save_iteration
        )
        self.logger.log_dict(metrics, global_step, wandb_commit=not is_last_before_eval)

    def _log_eval_callback(self, metrics, combined_step):
        global_step = int(np.asarray(combined_step)) * self.batch_size
        self.logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, global_step)

    def _save_callback(self, policy_state, critic_state, is_best=False):
        self.save(policy_state, critic_state)
        if bool(np.asarray(is_best)):
            # best-by-eval-return alongside latest (`ppo/flax/ppo.py:350-356`)
            self.save(policy_state, critic_state, file_name="best.model")

    # ---------------------------------------------------------- save / load

    def _checkpoint_tree(self, policy_state, critic_state):
        if self.config.runner.save_optimizer_state:
            return {"full": ckpt.full_state_dict({"policy": policy_state, "critic": critic_state})}
        return {"policy": policy_state.params, "critic": critic_state.params}

    def save(self, policy_state=None, critic_state=None, file_name="latest.model"):
        policy_state = self.policy_state if policy_state is None else policy_state
        critic_state = self.critic_state if critic_state is None else critic_state
        ckpt.save_model_file(
            self.save_path,
            file_name,
            self._checkpoint_tree(policy_state, critic_state),
            self.config.algorithm.to_dict(),
        )

    @classmethod
    def load(cls, config, train_env, eval_env, run_path, writer, explicitly_set_algorithm_params):
        restored, loaded_config = ckpt.load_model_file(config.runner.load_model)
        ckpt.merge_loaded_algorithm_config(config, loaded_config, explicitly_set_algorithm_params)
        model = cls(config, train_env, eval_env, run_path, writer)
        target = model._checkpoint_tree(model.policy_state, model.critic_state)
        restored, _ = ckpt.load_model_file(config.runner.load_model, target)
        if "full" in restored:
            states = ckpt.restore_full_state(
                {"policy": model.policy_state, "critic": model.critic_state}, restored["full"]
            )
            model.policy_state, model.critic_state = states["policy"], states["critic"]
        else:
            model.policy_state = model.policy_state.replace(params=restored["policy"])
            model.critic_state = model.critic_state.replace(params=restored["critic"])
        return model

    def test(self, episodes):
        """Deterministic rollouts; collects ``episodes`` ACTUAL completed
        episodes (reference nr_test_episodes semantics,
        `ppo/flax/ppo.py:469-485`)."""
        from rlx_tpu.algorithms.evaluation import collect_test_returns

        @jax.jit
        def rollout(env_state):
            action = self.policy.mode(self.policy_state.params, env_state.observation)
            return self.eval_env.step(env_state, self.policy.process_action(action))

        self.key, reset_key = jax.random.split(self.key)
        env_state = self.eval_env.reset(reset_key, eval_mode=True)
        return collect_test_returns(rollout, env_state, episodes, self.horizon)

    def general_properties():
        return GeneralProperties
