import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
import jax
cache_dir = "/tmp/rlx_tpu_jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from rlx_tpu.config import create_model, make_config

config = make_config("dqn.tpu", "classic.pixel_chase.tpu", **{
    "environment.nr_envs": 128,
    "algorithm.total_timesteps": 400_000,
    "algorithm.learning_starts": 10_000,
    "algorithm.buffer_size": 50_000,
    "algorithm.batch_size": 256,
    "algorithm.learning_rate": 1e-4,
    "algorithm.epsilon_decay_steps": 150_000,
    "algorithm.target_update_frequency": 4_000,
    "algorithm.update_frequency": 1,
    "algorithm.evaluation_and_save_frequency": 48_000,
    "algorithm.logging_active": False,
    "runner.save_model": False,
    "runner.chunked_train": True,
    "environment.frame_stack": int(os.environ.get("PROBE_FRAME_STACK", "4")),
    "environment.goal_period": int(os.environ.get("PROBE_GOAL_PERIOD", "2")),
})
model = create_model(config)
start = time.time()
model.train()
print("wall", round(time.time()-start,1))
print("steps", list(model.eval_history["steps"]))
print("returns", [round(float(x),3) for x in model.eval_history["eval/episode_return"]])
