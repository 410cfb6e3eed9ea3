"""PQN (parallelized Q-network) as one fused XLA program.

Parity with `rl_x/algorithms/pqn/flax/pqn.py`: replay-free on-policy
Q-learning — eps-greedy rollouts, Q(lambda) targets via a reverse scan
(`pqn.py:112-131`), PPO-style per-epoch independently-permuted minibatch
epochs (`pqn.py:161-189`), all-layer LayerNorm Q-network (no target nets).
Shares the fused on-policy skeleton: rollout scan -> target scan ->
minibatch-update scan, eval/save/log cadence via callbacks, env axis
sharded over the mesh dp axis.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from rlx_tpu.algorithms.pqn.tpu.general_properties import GeneralProperties
from rlx_tpu.models.mlp import DiscreteQNet
from rlx_tpu.parallel import mesh as mesh_lib
from rlx_tpu.utils import checkpoint as ckpt
from rlx_tpu.utils.logging import MetricsLogger, rlx_logger
from rlx_tpu.algorithms.training_program import run_training_program


class PQN:
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
        self.q_lambda = a.q_lambda
        self.max_grad_norm = a.max_grad_norm
        self.evaluation_active = a.evaluation_active

        self.batch_size = self.nr_envs * self.nr_steps
        self.minibatch_size = self.batch_size // self.nr_minibatches
        self.nr_updates = max(self.total_timesteps // self.batch_size, 1)
        self.eval_save_frequency = a.evaluation_and_save_frequency
        if self.eval_save_frequency == -1:
            self.eval_save_frequency = self.batch_size * self.nr_updates
        self.nr_eval_save_iterations = max(self.total_timesteps // self.eval_save_frequency, 1)
        self.nr_updates_per_eval_save_iteration = self.eval_save_frequency // self.batch_size

        self.epsilon_start = a.epsilon_start
        self.epsilon_end = a.epsilon_end
        self.epsilon_decay_updates = max(int(a.epsilon_decay_fraction * self.nr_updates), 1)

        self.horizon = train_env.horizon
        self.os_shape = train_env.single_observation_space.shape
        self.nr_actions = train_env.single_action_space.n

        self.mesh = mesh_lib.make_mesh(
            dp=(None if config.runner.mesh_dp == -1 else config.runner.mesh_dp),
            tp=config.runner.mesh_tp,
        )
        self.logger = MetricsLogger(
            config.runner.track_console, config.runner.track_tb, config.runner.track_wandb, writer
        )
        rlx_logger.info(f"Using device: {jax.default_backend()}, mesh: {dict(self.mesh.shape)}")

        self.key = jax.random.PRNGKey(self.seed)
        self.key, critic_key = jax.random.split(self.key)

        self.q_net = DiscreteQNet(
            nr_actions=self.nr_actions,
            hidden_sizes=tuple(a.critic_hidden_sizes),
            activation=a.activation,
            layer_norm_all=True,
        )

        def linear_schedule(count):
            fraction = 1.0 - (count // (self.nr_minibatches * self.nr_epochs)) / self.nr_updates
            return self.learning_rate * fraction

        lr = linear_schedule if self.anneal_learning_rate else self.learning_rate
        self._make_tx = lambda: optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        self.critic_state = self._make_train_states(critic_key)
        self.critic_state = jax.device_put(self.critic_state, mesh_lib.replicated_sharding(self.mesh))

        # Parallel seeds (same contract/constraints as ppo.py:74-88)
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
        self._last_log_time = time.time()

    def _make_train_states(self, critic_key):
        """Jittable per-seed Q-net/optimizer init."""
        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        return TrainState.create(
            apply_fn=self.q_net.apply,
            params=self.q_net.init(critic_key, dummy_obs),
            tx=self._make_tx(),
        )

    def epsilon(self, update_step):
        fraction = jnp.minimum(update_step / self.epsilon_decay_updates, 1.0)
        return self.epsilon_start + fraction * (self.epsilon_end - self.epsilon_start)

    def _learning_iteration(self, carry, learning_iteration_step, outer_step):
        critic_state, env_state, key = carry
        combined_step = outer_step * self.nr_updates_per_eval_save_iteration + learning_iteration_step
        eps = self.epsilon(combined_step)

        def single_rollout_step(rollout_carry, _):
            critic_state, env_state, key = rollout_carry
            key, explore_key, pick_key = jax.random.split(key, 3)
            observation = env_state.observation
            q = self.q_net.apply(critic_state.params, observation)
            greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
            random_action = jax.random.randint(explore_key, greedy.shape, 0, self.nr_actions, dtype=jnp.int32)
            action = jnp.where(jax.random.uniform(pick_key, greedy.shape) < eps, random_action, greedy)
            env_state = self.train_env.step(env_state, action)
            transition = (observation, env_state.final_observation, action,
                          env_state.reward, env_state.terminated, env_state.info)
            return (critic_state, env_state, key), transition

        (critic_state, env_state, key), batch = jax.lax.scan(
            single_rollout_step, (critic_state, env_state, key), None, self.nr_steps
        )
        observations, final_observations, actions, rewards, terminations, infos = batch
        terminations = terminations.astype(jnp.float32)

        # Q(lambda) targets, reverse scan over the rollout
        next_values = self.q_net.apply(critic_state.params, final_observations).max(axis=-1)
        last_target = rewards[-1] + self.gamma * next_values[-1] * (1.0 - terminations[-1])

        def compute_q_targets(carry_target, inputs):
            reward_t, termination_t, next_q_t = inputs
            mixed = self.q_lambda * carry_target + (1.0 - self.q_lambda) * next_q_t
            q_target = reward_t + self.gamma * mixed * (1.0 - termination_t)
            return q_target, q_target

        _, q_targets = jax.lax.scan(
            compute_q_targets, last_target, (rewards, terminations, next_values), reverse=True
        )

        batch_observations = mesh_lib.shard_batch(
            observations.reshape((-1,) + self.os_shape), self.mesh
        )
        batch_actions = actions.reshape(-1)
        batch_q_targets = q_targets.reshape(-1)

        def loss_fn(params, obs_mb, action_mb, target_mb):
            q = self.q_net.apply(params, obs_mb)
            q_action = jnp.take_along_axis(q, action_mb[:, None], axis=-1).squeeze(-1)
            loss = (0.5 * (q_action - target_mb) ** 2).mean()
            return loss, q_action.mean()

        grad_loss_fn = jax.value_and_grad(loss_fn, has_aux=True)

        key, perm_key = jax.random.split(key)
        batch_indices = jnp.tile(jnp.arange(self.batch_size), (self.nr_epochs, 1))
        batch_indices = jax.random.permutation(perm_key, batch_indices, axis=1, independent=True)
        batch_indices = batch_indices.reshape((self.nr_epochs * self.nr_minibatches, self.minibatch_size))

        def minibatch_update(critic_state, minibatch_indices):
            (loss, q_mean), grads = grad_loss_fn(
                critic_state.params,
                batch_observations[minibatch_indices],
                batch_actions[minibatch_indices],
                batch_q_targets[minibatch_indices],
            )
            critic_state = critic_state.apply_gradients(grads=grads)
            return critic_state, {
                "loss/q_loss": loss,
                "q_value/q_value": q_mean,
                "gradients/critic_grad_norm": optax.global_norm(grads),
            }

        critic_state, metrics = jax.lax.scan(minibatch_update, critic_state, batch_indices)
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["lr/learning_rate"] = critic_state.opt_state[1].hyperparams["learning_rate"]
        metrics["epsilon/epsilon"] = eps

        if self.config.algorithm.logging_active:
            combined_metrics = {**jax.tree.map(jnp.mean, infos), **metrics}
            jax.debug.callback(
                self._log_train_callback, combined_metrics, combined_step + 1, learning_iteration_step
            )
        return (critic_state, env_state, key), None

    def _init_train_carry(self, key, states=None):
        critic_state = self.critic_state if states is None else states
        key, reset_key = jax.random.split(key)
        env_state = self.train_env.reset(reset_key, eval_mode=False)
        env_state = mesh_lib.shard_batch(env_state, self.mesh)
        return (critic_state, env_state, key)

    def _eval_save_iteration(self, carry, outer_step):
        critic_state, env_state, key = carry
        key, learn_key, eval_key = jax.random.split(key, 3)
        (critic_state, env_state, _), _ = jax.lax.scan(
            partial(self._learning_iteration, outer_step=outer_step),
            (critic_state, env_state, learn_key),
            jnp.arange(self.nr_updates_per_eval_save_iteration),
        )
        eval_metrics = None
        if self.evaluation_active:
            eval_metrics = self._eval_iteration(critic_state, eval_key, outer_step)
        if self.save_model:
            jax.debug.callback(self._save_callback, critic_state)
        return (critic_state, env_state, key), eval_metrics

    def build_train_function(self):
        def jitable_train_function(key):
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key),
                jnp.arange(self.nr_eval_save_iterations),
            )

        return jitable_train_function

    def _eval_iteration(self, critic_state, key, outer_step):
        def single_eval_step(carry, _):
            critic_state, eval_env_state = carry
            action = jnp.argmax(
                self.q_net.apply(critic_state.params, eval_env_state.observation), axis=-1
            ).astype(jnp.int32)
            eval_env_state = self.eval_env.step(eval_env_state, action)
            return (critic_state, eval_env_state), None

        eval_env_state = self.eval_env.reset(key, eval_mode=True)
        (_, eval_env_state), _ = jax.lax.scan(
            single_eval_step, (critic_state, eval_env_state), None, self.horizon
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
            states = self._make_train_states(init_key)
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key, states),
                jnp.arange(self.nr_eval_save_iterations),
            )

        seed_keys = jax.random.split(run_key, self.nr_parallel_seeds)
        carries, eval_history = jax.block_until_ready(
            jax.jit(jax.vmap(per_seed))(seed_keys)
        )
        return jax.tree.map(lambda x: x[0], carries[0]), eval_history

    def train(self):
        self.key, run_key = jax.random.split(self.key)
        self._last_log_time = time.time()
        start = time.time()
        if self.nr_parallel_seeds > 1:
            self.critic_state, eval_history = self._train_parallel_seeds(run_key)
        else:
            carry, eval_history = run_training_program(self, run_key)
            self.critic_state = carry[0]
        # callback-free curve record (see ppo.py train())
        self.eval_history = None
        if eval_history is not None:
            steps = (np.arange(self.nr_eval_save_iterations) + 1) * self.nr_updates_per_eval_save_iteration * self.batch_size
            self.eval_history = {"steps": steps}
            self.eval_history.update({k: np.asarray(v) for k, v in eval_history.items()})
        rlx_logger.info(f"Average time: {time.time() - start:.2f} s")

    # callbacks / persistence ------------------------------------------------
    def _log_train_callback(self, metrics, combined_step, learning_iteration_step):
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        now = time.time()
        metrics["time/sps"] = int(self.batch_size / max(now - self._last_log_time, 1e-9))
        self._last_log_time = now
        global_step = int(np.asarray(combined_step)) * self.batch_size
        metrics["steps/nr_env_steps"] = global_step
        metrics["steps/nr_updates"] = int(np.asarray(combined_step)) * self.nr_epochs * self.nr_minibatches
        self.logger.log_dict(metrics, global_step)

    def _log_eval_callback(self, metrics, outer_step):
        global_step = int((np.asarray(outer_step) + 1) * self.eval_save_frequency)
        self.logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, global_step)

    def _save_callback(self, critic_state):
        ckpt.save_model_file(
            self.save_path, "latest.model", {"critic": critic_state.params},
            self.config.algorithm.to_dict(),
        )

    def save(self):
        self._save_callback(self.critic_state)

    @staticmethod
    def load(config, train_env, eval_env, run_path, writer, explicitly_set_algorithm_params):
        restored, loaded_config = ckpt.load_model_file(config.runner.load_model)
        ckpt.merge_loaded_algorithm_config(config, loaded_config, explicitly_set_algorithm_params)
        model = PQN(config, train_env, eval_env, run_path, writer)
        restored, _ = ckpt.load_model_file(config.runner.load_model, {"critic": model.critic_state.params})
        model.critic_state = model.critic_state.replace(params=restored["critic"])
        return model

    def test(self, episodes):
        @jax.jit
        def rollout(env_state):
            action = jnp.argmax(
                self.q_net.apply(self.critic_state.params, env_state.observation), axis=-1
            ).astype(jnp.int32)
            return self.eval_env.step(env_state, action)

        from rlx_tpu.algorithms.evaluation import collect_test_returns

        self.key, reset_key = jax.random.split(self.key)
        env_state = self.eval_env.reset(reset_key, eval_mode=True)
        return collect_test_returns(rollout, env_state, episodes, self.horizon)

    def general_properties():
        return GeneralProperties
