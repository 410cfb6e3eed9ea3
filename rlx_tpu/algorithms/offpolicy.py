"""Shared scaffolding for off-policy fused training programs.

The reference deliberately copy-pastes this structure into every off-policy
directory (`rl_x/algorithms/sac/flax_full_jit/sac.py:129-391`, likewise
td3/ddpg/redq/droq/...).  Here the skeleton — on-device sharded replay
buffer, prefill scan, eval/logging cadence scans, callbacks, checkpoint
artifacts — lives once, and each algorithm directory implements only:

- ``setup_states() -> dict[str, TrainState]``  (networks + optimizers)
- ``act(states, observation, key) -> action``           (normalized [-1,1])
- ``eval_act(states, observation) -> action``
- ``update(states, batch, key, step) -> (states, metrics)``

The training loop itself (1 env step : 1 gradient step, uniform in-jit
sampling) matches the reference cadence semantics exactly: logging every
``logging_frequency`` env steps, evaluation/save every
``evaluation_and_save_frequency``.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.algorithms.training_program import run_training_program
from rlx_tpu.models.mlp import get_processed_action_function
from rlx_tpu.ops import replay_buffer as rb
from rlx_tpu.parallel import mesh as mesh_lib
from rlx_tpu.utils import checkpoint as ckpt
from rlx_tpu.utils.logging import MetricsLogger, rlx_logger


class OffPolicyAlgorithm:
    def __init__(self, config, train_env, eval_env, run_path, writer):
        self.config = config
        self.train_env = train_env
        self.eval_env = eval_env
        self.run_path = run_path

        a = config.algorithm
        self.save_model = config.runner.save_model
        self.save_path = f"{run_path}/models" if run_path else None
        self.seed = config.environment.seed
        # NOTE: when (total_timesteps - learning_starts) is not divisible by
        # evaluation_and_save_frequency the run trains up to one eval window
        # PAST the nominal budget (ceil below) — deliberate, so the full
        # requested budget is always trained; schedules keyed to
        # total_timesteps extend proportionally (advisor r3).
        self.total_timesteps = int(a.total_timesteps)
        self.nr_envs = config.environment.nr_envs
        self.learning_rate = a.learning_rate
        self.buffer_size = int(getattr(a, "buffer_size", 0))
        self.learning_starts = int(a.learning_starts)
        self.batch_size = a.batch_size
        self.gamma = a.gamma
        self.tau = getattr(a, "tau", 0.005)
        self.logging_frequency = int(a.logging_frequency)
        self.evaluation_active = a.evaluation_active

        # Parallel seeds: vmap the whole program (state init + prefill +
        # train scan) over a seed axis, as the reference plumbs through every
        # flax_full_jit family (`sac/flax_full_jit/sac.py:387`).  Same
        # callback constraints as ppo.py:74-88.
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

        # FastTD3-family sizing: buffer capacity and learning starts scale
        # with nr_envs (`fastmpo/flax_full_jit/default_config.py:46-48`).
        if int(getattr(a, "learning_starts_per_env", 0)) > 0:
            self.learning_starts = int(a.learning_starts_per_env) * self.nr_envs

        self.total_training_timesteps = self.total_timesteps - self.learning_starts
        self.eval_save_frequency = a.evaluation_and_save_frequency
        if self.eval_save_frequency == -1:
            self.eval_save_frequency = self.nr_envs * max(self.total_training_timesteps // self.nr_envs, 1)
        # ceil so the full requested budget is trained (floor under-ran the
        # last partial eval window, e.g. 100k budget / 12.5k freq with 5k
        # learning starts trained only 92.5k steps)
        self.nr_eval_save_iterations = max(
            int(np.ceil(self.total_training_timesteps / self.eval_save_frequency)), 1
        )
        self.nr_loggings_per_eval_save_iteration = max(self.eval_save_frequency // self.logging_frequency, 1)
        self.nr_updates_per_logging_iteration = max(self.logging_frequency // self.nr_envs, 1)
        if int(getattr(a, "buffer_size_per_env", 0)) > 0:
            self.capacity = int(a.buffer_size_per_env)
        else:
            self.capacity = max(self.buffer_size // self.nr_envs, 1)
        self.prefill_iterations = (
            int(np.ceil(self.learning_starts / self.nr_envs)) if self.learning_starts > 0 else 0
        )

        self.horizon = train_env.horizon
        self.os_shape = train_env.single_observation_space.shape
        self.as_shape = train_env.single_action_space.shape
        from rlx_tpu.environments.types import ActionSpaceType

        self.discrete = (
            train_env.general_properties.action_space_type == ActionSpaceType.DISCRETE
        )
        # Image observations replay as uint8 (4x less HBM than f32 — an
        # 84x84x4 stack at 50k capacity is 2.8 GB instead of 11.3 GB; the
        # Atari convention).  Envs emit integral 0..255 floats, so the cast
        # is exact; NatureCNN casts back to f32 on the way in.
        from rlx_tpu.environments.types import ObservationSpaceType

        self.image_obs = (
            train_env.general_properties.observation_space_type == ObservationSpaceType.IMAGES
        )
        self.obs_store_dtype = jnp.uint8 if self.image_obs else jnp.float32
        if self.discrete:
            self.nr_actions = train_env.single_action_space.n
            self.action_dim = 1
        else:
            self.action_dim = int(np.prod(self.as_shape))

        self.mesh = mesh_lib.make_mesh(
            dp=(None if config.runner.mesh_dp == -1 else config.runner.mesh_dp),
            tp=config.runner.mesh_tp,
        )
        self.dp_size = self.mesh.shape[mesh_lib.DP_AXIS]
        self.shard_local_sampling = getattr(a, "shard_local_sampling", True)
        self.n_step = int(getattr(a, "n_step", 1))

        self.logger = MetricsLogger(
            config.runner.track_console, config.runner.track_tb, config.runner.track_wandb, writer
        )
        rlx_logger.info(f"Using device: {jax.default_backend()}, mesh: {dict(self.mesh.shape)}")

        self.key = jax.random.PRNGKey(self.seed)
        if self.discrete:
            self.process_action = lambda a: a
        elif hasattr(a, "action_rescaling"):
            # Fast-family action pipeline: optional clip, then "none" /
            # "normal" / "fastsac" rescaling
            # (`fastmpo/flax_full_jit/policy.py:128-138`).
            space = train_env.single_action_space
            low, high = jnp.asarray(space.low), jnp.asarray(space.high)
            clip = bool(getattr(a, "action_clipping", True))
            mode = a.action_rescaling
            if mode == "fastsac":
                center = jnp.asarray(getattr(space, "center", (low + high) / 2.0))
                scale = jnp.asarray(getattr(space, "scale", (high - low) / 2.0))
                action_scale = jnp.maximum(jnp.abs(low - center), jnp.abs(high - center)) / scale
            else:
                action_scale = None

            def process(action):
                if clip:
                    action = jnp.clip(action, -1.0, 1.0)
                if mode == "normal":
                    action = low + 0.5 * (action + 1.0) * (high - low)
                elif mode == "fastsac":
                    action = action * action_scale
                return action

            self.process_action = process
        else:
            self.process_action = get_processed_action_function(
                True, train_env.single_action_space.low, train_env.single_action_space.high
            )

        self.states = self.setup_states()
        repl = mesh_lib.replicated_sharding(self.mesh)
        self.states = jax.device_put(self.states, repl)

        self._last_log_time = time.time()

    # --- algorithm hooks ---------------------------------------------------
    def setup_states(self):
        raise NotImplementedError

    def act(self, states, observation, key, step):
        raise NotImplementedError

    def eval_act(self, states, observation):
        raise NotImplementedError

    def update(self, states, batch, key, step):
        raise NotImplementedError

    def extra_buffer_fields(self):
        """Override to store extra per-transition fields."""
        return {}

    def observe_transition(self, states, observation, env_state):
        """Hook after each env step (FastTD3-family running normalizers)."""
        return states

    def pre_act(self, states, key, step):
        """Hook before acting (FlashSAC's repeated-noise state)."""
        return states

    # --- scaffolding -------------------------------------------------------
    def _make_buffer(self):
        buffer = rb.create(
            self.capacity,
            self.nr_envs,
            {
                "observation": (self.os_shape, self.obs_store_dtype),
                "next_observation": (self.os_shape, self.obs_store_dtype),
                "action": ((), jnp.int32) if self.discrete else ((self.action_dim,), jnp.float32),
                "reward": ((), jnp.float32),
                "terminated": ((), jnp.float32),
                "truncated": ((), jnp.float32),
                **self.extra_buffer_fields(),
            },
        )
        # packed storage is env-major [nr_envs, capacity, D]; dict fallback
        # keeps [capacity, nr_envs, ...] — shard the env axis either way
        if buffer.packed:
            sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(mesh_lib.DP_AXIS)
            )
        else:
            sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, mesh_lib.DP_AXIS)
            )
        storage = jax.tree.map(
            lambda arr: jax.lax.with_sharding_constraint(arr, sharding), buffer.storage
        )
        return buffer.replace(storage=storage)

    def _store_step(self, buffer, observation, action, env_state):
        return rb.add(
            buffer,
            {
                "observation": observation.astype(self.obs_store_dtype),
                "next_observation": env_state.final_observation.astype(self.obs_store_dtype),
                "action": action,
                "reward": env_state.reward,
                "terminated": env_state.terminated.astype(jnp.float32),
                "truncated": env_state.truncated.astype(jnp.float32),
            },
        )

    def _learning_step(self, carry, step):
        states, buffer, env_state, key = carry
        key, pre_act_key, action_key, sample_key, update_key = jax.random.split(key, 5)

        states = self.pre_act(states, pre_act_key, step)
        observation = env_state.observation
        action = self.act(states, observation, action_key, step)
        env_state = self.train_env.step(env_state, self.process_action(action))
        buffer = self._store_step(buffer, observation, action, env_state)
        states = self.observe_transition(states, observation, env_state)

        if hasattr(self, "update_with_buffer"):
            # High-UTD algorithms (REDQ/DroQ/AQE) draw several fresh batches
            # per env step and own their sampling.
            states, metrics = self.update_with_buffer(states, buffer, update_key, step)
        else:
            if self.n_step > 1:
                batch = rb.sample_nstep(
                    buffer, sample_key, self.batch_size, self.n_step, self.gamma,
                    shard_local=self.shard_local_sampling, dp_size=self.dp_size,
                )
            else:
                batch = rb.sample(
                    buffer, sample_key, self.batch_size,
                    shard_local=self.shard_local_sampling, dp_size=self.dp_size,
                )
            batch = mesh_lib.shard_batch(batch, self.mesh)
            states, metrics = self.update(states, batch, update_key, step)
        return (states, buffer, env_state, key), (env_state.info, metrics)

    def _logging_iteration(self, carry, logging_iteration_step, eval_save_iteration_step):
        states, buffer, env_state, key = carry
        key, subkey = jax.random.split(key)
        step_base = (
            eval_save_iteration_step * self.nr_loggings_per_eval_save_iteration
            + logging_iteration_step
        ) * self.nr_updates_per_logging_iteration
        carry, (infos, metrics) = jax.lax.scan(
            self._learning_step,
            (states, buffer, env_state, subkey),
            step_base + jnp.arange(self.nr_updates_per_logging_iteration),
        )
        if self.config.algorithm.logging_active:
            combined = {**jax.tree.map(jnp.mean, infos), **jax.tree.map(jnp.mean, metrics)}
            nr_update_iteration = step_base + self.nr_updates_per_logging_iteration
            jax.debug.callback(
                self._log_train_callback, combined, nr_update_iteration, logging_iteration_step
            )
        return carry, None

    def _eval_iteration(self, states, key, eval_save_iteration_step):
        def single_eval_step(carry, _):
            states, eval_env_state = carry
            action = self.eval_act(states, eval_env_state.observation)
            eval_env_state = self.eval_env.step(eval_env_state, self.process_action(action))
            return (states, eval_env_state), None

        eval_env_state = self.eval_env.reset(key, eval_mode=True)
        eval_env_state = mesh_lib.shard_batch(eval_env_state, self.mesh)
        (_, eval_env_state), _ = jax.lax.scan(
            single_eval_step, (states, eval_env_state), None, self.horizon
        )
        # every rollout/ info key becomes an eval metric (episode return/
        # length everywhere; episode_tracking on the locomotion family)
        eval_metrics = {
            "eval/" + k.split("rollout/", 1)[1]: jnp.mean(v)
            for k, v in eval_env_state.info.items()
            if k.startswith("rollout/")
        }
        if self.config.algorithm.logging_active:
            jax.debug.callback(self._log_eval_callback, eval_metrics, eval_save_iteration_step)
        return eval_metrics

    def _init_train_carry(self, key, states=None):
        states = self.states if states is None else states
        key, reset_key = jax.random.split(key)
        env_state = self.train_env.reset(reset_key, eval_mode=False)
        env_state = mesh_lib.shard_batch(env_state, self.mesh)
        buffer = self._make_buffer()

        def prefill_step(carry, _):
            env_state, buffer, key = carry
            key, sample_key = jax.random.split(key)
            if self.discrete:
                action = jax.random.randint(
                    sample_key, (self.nr_envs,), 0, self.nr_actions, dtype=jnp.int32
                )
            else:
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
        return (states, buffer, env_state, key, -jnp.inf)

    def _eval_save_iteration(self, carry, eval_save_iteration_step):
        states, buffer, env_state, key, best_return = carry
        key, learn_key, eval_key = jax.random.split(key, 3)
        (states, buffer, env_state, _), _ = jax.lax.scan(
            partial(self._logging_iteration, eval_save_iteration_step=eval_save_iteration_step),
            (states, buffer, env_state, learn_key),
            jnp.arange(self.nr_loggings_per_eval_save_iteration),
        )
        eval_metrics = None
        is_best = jnp.asarray(False)
        if self.evaluation_active:
            eval_metrics = self._eval_iteration(states, eval_key, eval_save_iteration_step)
            is_best = eval_metrics["eval/episode_return"] > best_return
            best_return = jnp.maximum(best_return, eval_metrics["eval/episode_return"])
        if self.save_model:
            jax.debug.callback(self._save_callback, states, is_best)
        return (states, buffer, env_state, key, best_return), eval_metrics

    def build_train_function(self):
        def jitable_train_function(key):
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key),
                jnp.arange(self.nr_eval_save_iterations),
            )

        return jitable_train_function

    def _train_parallel_seeds(self, run_key):
        """vmap the ENTIRE training program (state init + buffer prefill +
        train scan) over ``nr_parallel_seeds`` independent seeds on one chip.

        Per-seed initial states are built eagerly (``setup_states`` is
        family-specific and draws from ``self.key``, so each call yields an
        independent init) and stacked onto the FIRST seed's treedef — the
        per-call optax transforms are identical closures, so seed 0's static
        structure serves all seeds.  Returns (first-seed states, eval_history
        with a leading seed axis)."""
        states_list = [self.states] + [
            self.setup_states() for _ in range(self.nr_parallel_seeds - 1)
        ]
        treedef = jax.tree.structure(states_list[0])
        stacked = jax.tree.unflatten(
            treedef,
            [jnp.stack(leaves)
             for leaves in zip(*(jax.tree.leaves(s) for s in states_list))],
        )

        def per_seed(states, key):
            return jax.lax.scan(
                self._eval_save_iteration,
                self._init_train_carry(key, states),
                jnp.arange(self.nr_eval_save_iterations),
            )

        seed_keys = jax.random.split(run_key, self.nr_parallel_seeds)
        carries, eval_history = jax.block_until_ready(
            jax.jit(jax.vmap(per_seed))(stacked, seed_keys)
        )
        first_states = jax.tree.map(lambda x: x[0], carries[0])
        return first_states, eval_history

    def train(self):
        self.key, run_key = jax.random.split(self.key)
        self._last_log_time = time.time()
        start = time.time()
        if self.nr_parallel_seeds > 1:
            self.states, eval_history = self._train_parallel_seeds(run_key)
        else:
            carry, eval_history = run_training_program(self, run_key)
            self.states = carry[0]
        # callback-free curve record (see ppo.py train())
        self.eval_history = None
        if eval_history is not None:
            # x-axis in actual env interactions consumed: the random prefill
            # (learning_starts) happens before the first recorded point
            steps = self.learning_starts + (
                np.arange(self.nr_eval_save_iterations) + 1
            ) * self.eval_save_frequency
            self.eval_history = {"steps": steps}
            self.eval_history.update({k: np.asarray(v) for k, v in eval_history.items()})
        rlx_logger.info(f"Average time: {time.time() - start:.2f} s")

    # --- callbacks ---------------------------------------------------------
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

    def _save_callback(self, states, is_best=False):
        ckpt.save_model_file(
            self.save_path,
            "latest.model",
            self.checkpoint_tree(states),
            self.config.algorithm.to_dict(),
        )
        if bool(np.asarray(is_best)):
            # best-by-eval-return alongside latest (`ppo/flax/ppo.py:350-356`)
            ckpt.save_model_file(
                self.save_path,
                "best.model",
                self.checkpoint_tree(states),
                self.config.algorithm.to_dict(),
            )

    def checkpoint_tree(self, states):
        if self.config.runner.save_optimizer_state:
            return {"full": ckpt.full_state_dict(states)}
        tree = {}
        for name, state in states.items():
            if hasattr(state, "params"):
                tree[name] = state.params
                if getattr(state, "target_params", None) is not None:
                    tree[f"{name}_target"] = state.target_params
            else:  # plain pytree state (normalizers etc.)
                tree[name] = state
        return tree

    def restore_from_tree(self, restored):
        if "full" in restored:
            self.states = ckpt.restore_full_state(self.states, restored["full"])
            return
        states = dict(self.states)
        for name, state in states.items():
            if hasattr(state, "params"):
                state = state.replace(params=restored[name])
                if f"{name}_target" in restored:
                    state = state.replace(target_params=restored[f"{name}_target"])
                states[name] = state
            else:
                states[name] = restored[name]
        self.states = states

    def save(self):
        self._save_callback(self.states)

    @classmethod
    def load(cls, config, train_env, eval_env, run_path, writer, explicitly_set_algorithm_params):
        restored, loaded_config = ckpt.load_model_file(config.runner.load_model)
        ckpt.merge_loaded_algorithm_config(config, loaded_config, explicitly_set_algorithm_params)
        model = cls(config, train_env, eval_env, run_path, writer)
        restored, _ = ckpt.load_model_file(config.runner.load_model, model.checkpoint_tree(model.states))
        model.restore_from_tree(restored)
        return model

    def test(self, episodes):
        from rlx_tpu.algorithms.evaluation import collect_test_returns

        @jax.jit
        def rollout(env_state):
            action = self.eval_act(self.states, env_state.observation)
            return self.eval_env.step(env_state, self.process_action(action))

        self.key, reset_key = jax.random.split(self.key)
        env_state = self.eval_env.reset(reset_key, eval_mode=True)
        return collect_test_returns(rollout, env_state, episodes, self.horizon)
