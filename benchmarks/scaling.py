"""Data-parallel scaling harness (BASELINE profiling points: 1 chip, 1 host,
N hosts).

Measures steady-state PPO env-steps/s at increasing dp mesh sizes and
reports efficiency relative to the dp=1 baseline.  On a real pod slice this
runs unmodified over the actual chips (and over hosts with
--coordinator_address); for functional validation without hardware, pass
--virtual_cpu to emulate 8 devices.

    python benchmarks/scaling.py --virtual_cpu --env classic.pendulum.tpu
    python benchmarks/scaling.py --env locomotion.ant.tpu     # on a pod
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_sps(env_name, dp, nr_envs, nr_steps, iterations):
    import jax

    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "ppo.tpu",
        env_name,
        **{
            "environment.nr_envs": nr_envs,
            "algorithm.total_timesteps": iterations * nr_envs * nr_steps,
            "algorithm.nr_steps": nr_steps,
            "algorithm.minibatch_size": nr_envs * nr_steps // 8,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "runner.mesh_dp": dp,
        },
    )
    model = create_model(config)
    fn = jax.jit(model.build_train_function())
    jax.block_until_ready(fn(jax.random.PRNGKey(0)))  # compile + warm-up
    start = time.perf_counter()
    jax.block_until_ready(fn(jax.random.PRNGKey(1)))
    elapsed = time.perf_counter() - start
    return iterations * nr_envs * nr_steps / elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="classic.pendulum.tpu")
    parser.add_argument("--virtual_cpu", action="store_true",
                        help="emulate 8 devices on CPU (functional validation)")
    parser.add_argument("--envs_per_device", type=int, default=512)
    parser.add_argument("--nr_steps", type=int, default=32)
    parser.add_argument("--iterations", type=int, default=5)
    parser.add_argument("--out", default="", help="write results JSON here")
    args = parser.parse_args()

    if args.virtual_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")

    nr_devices = len(jax.devices())
    dps = [d for d in (1, 2, 4, 8, 16, 32) if d <= nr_devices]
    results = {}
    records = []
    for dp in dps:
        # weak scaling: constant work per device
        sps = measure_sps(args.env, dp, args.envs_per_device * dp, args.nr_steps, args.iterations)
        results[dp] = sps
        base = results[dps[0]]
        efficiency = sps / (base * dp / dps[0])
        record = {
            "dp": dp,
            "env_steps_per_s": round(sps),
            "scaling_efficiency_vs_dp1": round(efficiency, 3),
        }
        records.append(record)
        print(json.dumps(record), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "env": args.env,
                "backend": jax.default_backend(),
                "virtual_cpu": bool(args.virtual_cpu),
                "envs_per_device": args.envs_per_device,
                "nr_steps": args.nr_steps,
                "weak_scaling": records,
            }, f, indent=1)


if __name__ == "__main__":
    main()
