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
            # bf16 trunk compute (heads/loss/Adam stay f32); learning parity
            # validated by benchmarks/results/locomotion_ppo_bf16.json
            "algorithm.compute_dtype": os.environ.get("RLX_BENCH_DTYPE", "bfloat16"),
        },
    )
    model = create_model(config)

    train_function = jax.jit(model.build_train_function())
    key = jax.random.PRNGKey(0)

    # compile + warm-up run (not measured)
    lowered = train_function.lower(key)
    compiled = lowered.compile()
    jax.block_until_ready(compiled(key))

    start = time.perf_counter()
    jax.block_until_ready(compiled(jax.random.PRNGKey(1)))
    elapsed = time.perf_counter() - start

    sps = iterations * batch / elapsed

    result = {
        "metric": f"ppo_env_steps_per_s_per_chip[{env_name}]",
        "value": round(sps),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }
    extra = {}
    if os.environ.get("RLX_BENCH_MFU", "1") != "0":
        try:
            extra.update(mfu_accounting(compiled, elapsed))
        except Exception as e:
            extra["mfu_error"] = str(e)[:200]
    if os.environ.get("RLX_BENCH_PHASES", "1") != "0":
        try:
            extra.update(bench_phases(model, iterations))
        except Exception as e:
            extra["phases_error"] = str(e)[:200]
    if os.environ.get("RLX_BENCH_OFFPOLICY", "1") != "0":
        try:
            extra.update(bench_offpolicy(env_name))
        except Exception as e:  # the headline PPO number must survive
            extra["offpolicy_error"] = str(e)[:200]
    if os.environ.get("RLX_BENCH_CONV", "1") != "0":
        try:
            extra.update(bench_conv())
        except Exception as e:
            extra["conv_error"] = str(e)[:200]
    if extra:
        result["extra"] = extra
    print(json.dumps(result))


# v5e (TPU v5 lite) peak: 197 TFLOP/s bf16 per chip (public spec); override
# for other chips via RLX_BENCH_PEAK_TFLOPS.
PEAK_TFLOPS = float(os.environ.get("RLX_BENCH_PEAK_TFLOPS", "197"))


def mfu_accounting(compiled, elapsed):
    """XLA cost-analysis FLOPs of the compiled whole-run program ->
    achieved TFLOP/s and fraction of chip peak (MFU).

    Note for RL: the training program is env-physics + small-MLP bound, so
    MFU is expected to be far below LLM-class numbers — the point of
    recording it is the roofline argument (what fraction of the remaining
    time is actually FLOP-limited), VERDICT r2 weak #4.
    """
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    achieved = flops / elapsed
    return {
        "cost_analysis_gflops_per_run": round(flops / 1e9, 1),
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_vs_peak": round(achieved / (PEAK_TFLOPS * 1e12), 5),
    }


def bench_phases(model, iterations):
    """Per-phase steady-state timing: rollout (env physics + policy
    inference) vs optimize (GAE + minibatch epochs), each as its own jitted
    program over the same shapes the fused run uses.  The two phases cover
    the whole learning iteration, so fused_ms ~ rollout_ms + update_ms; the
    gap is the fusion benefit / scheduling overhead."""
    import jax
    import jax.numpy as jnp

    env = model.train_env
    policy = model.policy

    def rollout_prog(env_state, key):
        def step(carry, _):
            env_state, key = carry
            key, sample_key = jax.random.split(key)
            action, _ = policy.sample_and_log_prob(
                model.policy_state.params, env_state.observation, sample_key
            )
            env_state = env.step(env_state, policy.process_action(action))
            return (env_state, key), None

        (env_state, key), _ = jax.lax.scan(step, (env_state, key), None, model.nr_steps)
        return env_state

    rollout_jit = jax.jit(rollout_prog, donate_argnums=0)
    key = jax.random.PRNGKey(2)
    env_state = jax.jit(lambda k: env.reset(k, eval_mode=False))(key)
    env_state = jax.block_until_ready(rollout_jit(env_state, key))  # compile
    start = time.perf_counter()
    for _ in range(iterations):
        env_state = rollout_jit(env_state, key)
    jax.block_until_ready(env_state)
    rollout_s = time.perf_counter() - start

    obs_dim = model.os_shape[0]
    action_dim = int(jnp.asarray(model.as_shape).prod())
    B = model.batch_size

    def update_prog(policy_state, critic_state, key):
        batch = (
            jax.random.normal(key, (B, obs_dim)),
            jax.random.normal(key, (B, action_dim)),
            jnp.zeros((B,)),
            jnp.zeros((B,)),
            jax.random.normal(key, (B,)),
        )
        policy_state, critic_state, _ = model._optimize(
            policy_state, critic_state, batch, key
        )
        return policy_state, critic_state

    update_jit = jax.jit(update_prog, donate_argnums=(0, 1))
    # donate COPIES: the model's own train states must stay valid for any
    # later use (use-after-donate hazard, advisor r3)
    ps0, cs0 = jax.tree.map(jnp.copy, (model.policy_state, model.critic_state))
    ps, cs = jax.block_until_ready(update_jit(ps0, cs0, key))  # compile
    start = time.perf_counter()
    for _ in range(iterations):
        ps, cs = update_jit(ps, cs, key)
    jax.block_until_ready((ps, cs))
    update_s = time.perf_counter() - start

    return {
        "phase_rollout_ms_per_iteration": round(rollout_s / iterations * 1e3, 2),
        "phase_update_ms_per_iteration": round(update_s / iterations * 1e3, 2),
        "phase_rollout_only_env_steps_per_s": round(iterations * B / rollout_s),
    }


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


def bench_conv(nr_envs=128, iterations=256):
    """Conv-net (NatureCNN) throughput: DQN on the 84x84x4 pixel_chase env,
    1 update (batch 256) per vectorized env step — the image track's
    BASELINE-config-4 stand-in number (curve record:
    benchmarks/results/pixel_chase_dqn.json)."""
    import jax

    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "dqn.tpu",
        "classic.pixel_chase.tpu",
        **{
            "environment.nr_envs": nr_envs,
            "algorithm.total_timesteps": nr_envs + 2 * iterations * nr_envs,
            "algorithm.learning_starts": nr_envs,
            "algorithm.buffer_size": nr_envs * 64,
            "algorithm.batch_size": 256,
            "algorithm.update_frequency": 1,
            "algorithm.logging_frequency": iterations * nr_envs,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
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
        "dqn_pixel_updates_per_s": round(total_updates / elapsed, 1),
        "dqn_pixel_env_steps_per_s": round(total_updates * nr_envs / elapsed),
        "dqn_pixel_obs": "84x84x4 uint8 replay, NatureCNN, batch 256",
    }


if __name__ == "__main__":
    main()
