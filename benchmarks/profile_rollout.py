"""Decompose the PPO rollout-phase cost on the real TPU.

The rollout phase (114 ms/iteration at the flagship bench config) is now
~68% of the PPO iteration after the round-4 update-phase work.  This times
its components as ITERS-step jitted scans at the bench config (4096 envs):

- raw physics (engine.step, the env's nr_substeps),
- full env.step (physics + control + reward/termination/obs + autoreset),
- policy sampling alone,
- the full rollout step (policy + env).

Prints one JSON line per variant.
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

ITERS = int(os.environ.get("PROF_ITERS", "256"))
NR_ENVS = int(os.environ.get("PROF_NR_ENVS", "4096"))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    start = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    ms = (time.perf_counter() - start) / ITERS * 1e3
    print(json.dumps({"variant": name, "ms_per_env_step": round(ms, 3)}), flush=True)
    return ms


def main():
    config = make_config(
        "ppo.tpu", "locomotion.ant.tpu",
        **{
            "environment.nr_envs": NR_ENVS,
            "algorithm.total_timesteps": NR_ENVS * 64,
            "algorithm.nr_steps": 64,
            "algorithm.minibatch_size": NR_ENVS * 8,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "algorithm.policy_hidden_sizes": (512, 256, 128),
            "algorithm.critic_hidden_sizes": (512, 256, 128),
            "algorithm.activation": "elu",
            "algorithm.layer_norm": True,
            "algorithm.compute_dtype": "bfloat16",
        },
    )
    model = create_model(config)
    env = model.train_env
    key = jax.random.PRNGKey(0)
    state0 = jax.jit(lambda k: env.reset(k, eval_mode=False))(key)
    jax.block_until_ready(state0)
    action = jnp.zeros((NR_ENVS,) + model.as_shape)

    # full rollout step (policy sample + env.step), as the fused program runs it
    def full(state, key):
        def step(carry, _):
            state, key = carry
            key, ak = jax.random.split(key)
            a, _ = model.policy.sample_and_log_prob(
                model.policy_state.params, state.observation, ak)
            state = env.step(state, model.policy.process_action(a))
            return (state, key), None
        (state, key), _ = jax.lax.scan(step, (state, key), None, ITERS)
        return state

    timeit("rollout_step_full", full, state0, key)

    # env.step only (fixed zero action)
    def env_only(state):
        def step(carry, _):
            return env.step(carry, action), None
        state, _ = jax.lax.scan(step, state, None, ITERS)
        return state

    timeit("env_step_only", env_only, state0)

    # policy sampling only
    def policy_only(state, key):
        def step(carry, k):
            acc = carry
            a, lp = model.policy.sample_and_log_prob(
                model.policy_state.params, state.observation, k)
            return acc + a.sum() + lp.sum(), None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, ITERS))
        return acc

    timeit("policy_sample_only", policy_only, state0, key)

    # raw physics: engine.step at the env's substep count (no reward/obs)
    from rlx_tpu.physics import engine

    inner = env
    while not hasattr(inner, "model") and hasattr(inner, "env"):
        inner = inner.env
    if hasattr(inner, "model") and hasattr(inner, "nr_substeps"):
        phys_model = inner.model
        nr_substeps = inner.nr_substeps
        phys = state0.physics
        qpos0 = phys["qpos"] if isinstance(phys, dict) else phys.qpos
        qvel0 = phys["qvel"] if isinstance(phys, dict) else phys.qvel
        ctrl = jnp.zeros((NR_ENVS, len(phys_model.act_dof)))

        def physics_only(qpos, qvel):
            def step(carry, _):
                qpos, qvel = carry
                qpos, qvel = engine.step(phys_model, qpos, qvel, ctrl,
                                         nr_substeps=nr_substeps)
                return (qpos, qvel), None
            (qpos, qvel), _ = jax.lax.scan(step, (qpos, qvel), None, ITERS)
            return qpos, qvel

        timeit(f"physics_only_x{nr_substeps}_substeps", physics_only, qpos0, qvel0)


if __name__ == "__main__":
    main()
