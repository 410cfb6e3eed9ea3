"""Minimal TPU probe to bisect device faults: run N train iterations of an
algorithm/env combo with logging+eval off.

    python benchmarks/_probe_tpu.py <algorithm> <environment> <nr_envs> [nr_steps] [eval]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.environ.get("RLX_BENCH_CACHE", "/tmp/rlx_tpu_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rlx_tpu.config import create_model, make_config

    algo, env, nr_envs = sys.argv[1], sys.argv[2], int(sys.argv[3])
    nr_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    do_eval = len(sys.argv) > 5 and sys.argv[5] == "eval"
    iterations = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    batch = nr_envs * nr_steps
    config = make_config(
        algo, env,
        **{
            "environment.nr_envs": nr_envs,
            "algorithm.total_timesteps": iterations * batch,
            "algorithm.nr_steps": nr_steps,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_active": do_eval,
            "algorithm.evaluation_and_save_frequency": iterations * batch if do_eval else -1,
            "algorithm.logging_active": False,
        },
    )
    model = create_model(config)
    import time
    t = time.time()
    model.train()
    print(f"PROBE OK {algo} {env} nr_envs={nr_envs} eval={do_eval} wall={time.time()-t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
