"""Decompose the SAC iteration cost on the real TPU (VERDICT r3 next #1c).

One learning iteration = act + env.step + buffer write + uniform sample +
gradient update (+ polyak).  Times each piece as its own ITERS-step jitted
scan at the bench config (1024 envs, batch 8192, (512,256,128) nets) and
prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("RLX_BENCH_CACHE", "/tmp/rlx_tpu_jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rlx_tpu.config import create_model, make_config
from rlx_tpu.ops import replay_buffer as rb

ITERS = int(os.environ.get("PROF_ITERS", "256"))
NR_ENVS = 1024
BATCH = 8192


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))  # compile
    start = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    ms = (time.perf_counter() - start) / ITERS * 1e3
    print(json.dumps({"variant": name, "ms_per_iteration": round(ms, 3)}), flush=True)
    return ms


def main():
    config = make_config(
        "sac.tpu",
        "locomotion.ant.tpu",
        **{
            "environment.nr_envs": NR_ENVS,
            "algorithm.total_timesteps": NR_ENVS * 4,
            "algorithm.learning_starts": NR_ENVS,
            "algorithm.buffer_size": NR_ENVS * 1024,
            "algorithm.batch_size": BATCH,
            "algorithm.logging_frequency": NR_ENVS,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "algorithm.policy_hidden_sizes": (512, 256, 128),
            "algorithm.critic_hidden_sizes": (512, 256, 128),
        },
    )
    model = create_model(config)
    key = jax.random.PRNGKey(0)

    # prefilled carry
    carry0 = jax.jit(model._init_train_carry)(key)
    states0, buffer0, env_state0 = carry0[0], carry0[1], carry0[2]
    jax.block_until_ready(buffer0)

    # full learning iteration (act + step + store + sample + update)
    def full(states, buffer, env_state, key):
        def step(carry, s):
            carry, _ = model._learning_step(carry, s)
            return carry, None
        (states, buffer, env_state, key), _ = jax.lax.scan(
            step, (states, buffer, env_state, key), jnp.arange(ITERS))
        return states, buffer, env_state

    timeit("full_iteration", full, states0, buffer0, env_state0, key)

    # act + env step + store only
    def rollout_only(states, buffer, env_state, key):
        def step(carry, s):
            states, buffer, env_state, key = carry
            key, ak = jax.random.split(key)
            obs = env_state.observation
            action = model.act(states, obs, ak, s)
            env_state = model.train_env.step(env_state, model.process_action(action))
            buffer = model._store_step(buffer, obs, action, env_state)
            return (states, buffer, env_state, key), None
        (states, buffer, env_state, key), _ = jax.lax.scan(
            step, (states, buffer, env_state, key), jnp.arange(ITERS))
        return buffer, env_state

    timeit("rollout_store_only", rollout_only, states0, buffer0, env_state0, key)

    # env step only (no policy act: random actions re-used)
    def env_only(env_state, key):
        action = jax.random.uniform(key, (NR_ENVS, model.action_dim), minval=-1, maxval=1)
        def step(carry, _):
            env_state = model.train_env.step(carry, model.process_action(action))
            return env_state, None
        env_state, _ = jax.lax.scan(step, env_state, None, ITERS)
        return env_state

    timeit("env_step_only", env_only, env_state0, key)

    # sample only
    def sample_only(buffer, key):
        def step(acc, k):
            batch = rb.sample(buffer, k, BATCH, shard_local=model.shard_local_sampling,
                              dp_size=model.dp_size)
            acc = acc + batch["observation"].sum() + batch["reward"].sum() + \
                batch["action"].sum() + batch["terminated"].sum() + \
                batch["truncated"].sum() + batch["next_observation"].sum()
            return acc, None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, ITERS))
        return acc

    timeit("sample_only", sample_only, buffer0, key)

    # update only (sample + gradient step, no env)
    def update_only(states, buffer, key):
        def step(carry, k):
            states = carry
            sk, uk = jax.random.split(k)
            batch = rb.sample(buffer, sk, BATCH, shard_local=model.shard_local_sampling,
                              dp_size=model.dp_size)
            states, _ = model.update(states, batch, uk, 0)
            return states, None
        states, _ = jax.lax.scan(step, states, jax.random.split(key, ITERS))
        return states

    timeit("sample_plus_update", update_only, states0, buffer0, key)


if __name__ == "__main__":
    main()


def extra_variants():
    """Diagnose full-loop slowdowns: write+gather aliasing on the packed array."""
    config = make_config(
        "sac.tpu", "locomotion.ant.tpu",
        **{
            "environment.nr_envs": NR_ENVS,
            "algorithm.total_timesteps": NR_ENVS * 4,
            "algorithm.learning_starts": NR_ENVS,
            "algorithm.buffer_size": NR_ENVS * 1024,
            "algorithm.batch_size": BATCH,
            "algorithm.logging_frequency": NR_ENVS,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "algorithm.policy_hidden_sizes": (512, 256, 128),
            "algorithm.critic_hidden_sizes": (512, 256, 128),
        },
    )
    model = create_model(config)
    key = jax.random.PRNGKey(0)
    carry0 = jax.jit(model._init_train_carry)(key)
    states0, buffer0, env_state0 = carry0[0], carry0[1], carry0[2]
    jax.block_until_ready(buffer0)

    # store + sample only (no nets): isolates the write+gather combination
    def store_sample_only(buffer, env_state, key):
        def step(carry, k):
            buffer, acc = carry
            action = jax.random.uniform(k, (NR_ENVS, model.action_dim), minval=-1, maxval=1)
            obs = env_state.observation
            buffer = model._store_step(buffer, obs, action, env_state)
            batch = rb.sample(buffer, k, BATCH, shard_local=model.shard_local_sampling,
                              dp_size=model.dp_size)
            acc = acc + batch["observation"].sum() + batch["reward"].sum()
            return (buffer, acc), None
        (buffer, acc), _ = jax.lax.scan(step, (buffer, jnp.zeros(())), jax.random.split(key, ITERS))
        return acc, buffer

    timeit("store_plus_sample", store_sample_only, buffer0, env_state0, key)

    # full again but without outputs (no stacked infos/metrics)
    def full_no_outputs(states, buffer, env_state, key):
        def step(carry, s):
            carry, _ = model._learning_step(carry, s)
            return carry, None
        (states, buffer, env_state, key), _ = jax.lax.scan(
            step, (states, buffer, env_state, key), jnp.arange(ITERS))
        return states
    timeit("full_no_buffer_output", full_no_outputs, states0, buffer0, env_state0, key)


if __name__ == "__main__" and os.environ.get("PROF_EXTRA"):
    extra_variants()
