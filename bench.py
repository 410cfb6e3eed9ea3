"""Benchmark harness: steady-state PPO env-steps/s on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus an
"extra" dict carrying the off-policy datapoint (SAC updates/s + env-steps/s
at 1 update per vectorized env step, `time/sps` definition of
`rl_x/algorithms/sac/flax/sac.py:336`).  Baseline: BASELINE.md target of
1,000,000 env-steps/s per v5e host for PPO on device-resident
locomotion-class envs (`time/sps` compatible with
`rl_x/algorithms/ppo/flax_full_jit/ppo.py:274-276`).

Runs on the default backend (the real TPU chip under the driver).
RLX_BENCH_OFFPOLICY=0 skips the SAC measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SPS = 1_000_000.0


def main():
    import jax

    # Persistent compilation cache: repeat bench runs skip the big compile.
    cache_dir = os.environ.get("RLX_BENCH_CACHE", "/tmp/rlx_tpu_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rlx_tpu.config import create_model, make_config

    env_name = os.environ.get("RLX_BENCH_ENV", "locomotion.ant.tpu")
    nr_envs = int(os.environ.get("RLX_BENCH_NR_ENVS", "4096"))
    nr_steps = int(os.environ.get("RLX_BENCH_NR_STEPS", "64"))
    iterations = int(os.environ.get("RLX_BENCH_ITERATIONS", "10"))

    try:
        from rlx_tpu.config import import_for

        import_for("environments", env_name)
    except ValueError:
        env_name = "classic.pendulum.tpu"  # fallback until the env exists

    batch = nr_envs * nr_steps
    config = make_config(
        "ppo.tpu",
        env_name,
        **{
            "environment.nr_envs": nr_envs,
            "algorithm.total_timesteps": iterations * batch,
            "algorithm.nr_steps": nr_steps,
            "algorithm.minibatch_size": batch // 8,
            "algorithm.nr_epochs": 4,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "algorithm.policy_hidden_sizes": (512, 256, 128),
            "algorithm.critic_hidden_sizes": (512, 256, 128),
            "algorithm.activation": "elu",
            "algorithm.layer_norm": True,
        },
    )
    model = create_model(config)

    train_function = jax.jit(model.build_train_function())
    key = jax.random.PRNGKey(0)

    # compile + warm-up run (not measured)
    jax.block_until_ready(train_function(key))

    start = time.perf_counter()
    jax.block_until_ready(train_function(jax.random.PRNGKey(1)))
    elapsed = time.perf_counter() - start

    sps = iterations * batch / elapsed

    result = {
        "metric": f"ppo_env_steps_per_s_per_chip[{env_name}]",
        "value": round(sps),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }
    if os.environ.get("RLX_BENCH_OFFPOLICY", "1") != "0":
        try:
            result["extra"] = bench_offpolicy(env_name)
        except Exception as e:  # the headline PPO number must survive
            result["extra"] = {"offpolicy_error": str(e)[:200]}
    print(json.dumps(result))


def bench_offpolicy(env_name, nr_envs=1024, iterations=512):
    """SAC at 1 update per vectorized env step: updates/s + env-steps/s."""
    import jax

    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "sac.tpu",
        env_name,
        **{
            "environment.nr_envs": nr_envs,
            "algorithm.total_timesteps": nr_envs + 2 * iterations * nr_envs,
            "algorithm.learning_starts": nr_envs,
            "algorithm.buffer_size": nr_envs * 1024,
            "algorithm.batch_size": 8192,
            "algorithm.logging_frequency": iterations * nr_envs,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "algorithm.policy_hidden_sizes": (512, 256, 128),
            "algorithm.critic_hidden_sizes": (512, 256, 128),
        },
    )
    model = create_model(config)
    train_function = jax.jit(model.build_train_function())
    jax.block_until_ready(train_function(jax.random.PRNGKey(0)))  # compile

    start = time.perf_counter()
    jax.block_until_ready(train_function(jax.random.PRNGKey(1)))
    elapsed = time.perf_counter() - start

    total_updates = 2 * iterations
    return {
        "sac_updates_per_s": round(total_updates / elapsed, 1),
        "sac_env_steps_per_s": round(total_updates * nr_envs / elapsed),
        "sac_nr_envs": nr_envs,
        "sac_batch_size": 8192,
    }


if __name__ == "__main__":
    main()
