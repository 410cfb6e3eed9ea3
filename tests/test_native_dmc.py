"""Golden tests: native C++ dm_control batcher vs dm_control suite itself.

From an identical (qpos, qvel) state and identical action sequences, the
C++ batcher (envbatch_dmc.cpp) must reproduce dm_control's observations and
rewards step for step — pinning the re-implemented task semantics (tolerance
rewards, observation layouts, sub-steps, legacy_step field sync) against the
original.  Also measures native vs Python-bridge throughput (the VERDICT r3
next #8 deliverable) as a recorded, non-asserted diagnostic.
"""

import numpy as np
import pytest

dm_control = pytest.importorskip("dm_control")

from dm_control import suite

from rlx_tpu.environments.native.batcher import DMCNativeEnvBatch

CASES = [
    ("cheetah_run", "cheetah", "run"),
    ("walker_walk", "walker", "walk"),
]


def _flatten(obs_dict):
    return np.concatenate([np.asarray(v, np.float64).reshape(-1) for v in obs_dict.values()])


@pytest.mark.parametrize("task,domain,dmc_task", CASES, ids=[c[0] for c in CASES])
def test_native_matches_dm_control(task, domain, dmc_task):
    env = suite.load(domain, dmc_task, task_kwargs={"random": 5})
    env.reset()
    native = DMCNativeEnvBatch(task, nr_envs=2, seed=5, nr_threads=1)
    native._host_reset(0)

    physics = env.physics
    qpos = np.array(physics.data.qpos)
    qvel = np.array(physics.data.qvel)
    native.set_state(0, qpos, qvel)

    rng = np.random.default_rng(11)
    act_dim = native.single_action_space.shape[0]
    for step in range(40):
        # identical float32-rounded actions on both sides (the native ABI is
        # f32; feeding dm_control the unrounded f64 action lets the walker's
        # chaotic dynamics amplify the rounding gap within ~30 steps)
        action = rng.uniform(-1.0, 1.0, act_dim).astype(np.float32).astype(np.float64)
        ts = env.step(action)
        dmc_obs = _flatten(ts.observation)

        actions = np.zeros((2, act_dim), np.float32)
        actions[0] = action
        obs, final_obs, reward, term, trunc, _ = native._host_step(actions)

        np.testing.assert_allclose(
            final_obs[0], dmc_obs, rtol=1e-4, atol=1e-5,
            err_msg=f"{task} obs diverged at step {step}",
        )
        np.testing.assert_allclose(
            reward[0], ts.reward, rtol=1e-4, atol=1e-5,
            err_msg=f"{task} reward diverged at step {step}",
        )
        assert not term[0]  # dmc suite tasks never terminate
    native.close()


def test_native_dmc_registration_and_episode_stats():
    """The registered env steps through the device protocol and surfaces
    episode statistics on truncation."""
    import jax

    from rlx_tpu.config import create_env, make_config

    config = make_config(
        "ppo.tpu", "native.dmc_cheetah_run.host",
        **{"environment.nr_envs": 2, "environment.nr_threads": 1},
    )
    train_env, eval_env = create_env(config)
    state = train_env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (2, 17)  # qpos[1:] (8) + qvel (9)
    action = np.zeros((2,) + train_env.single_action_space.shape, np.float32)
    for _ in range(3):
        state = train_env.step(state, action)
    assert np.isfinite(np.asarray(state.observation)).all()
    assert float(np.asarray(state.reward).min()) >= 0.0  # tolerance in [0, 1]
    train_env.close()
    eval_env.close()


@pytest.mark.slow
def test_native_vs_python_bridge_throughput():
    """Measured comparison (printed, not asserted): native C++ batcher vs the
    Python dm_control host bridge at the same nr_envs."""
    import time

    from rlx_tpu.environments.dmc.host_bridge import DMCHostEnv

    nr_envs, steps = 8, 50
    native = DMCNativeEnvBatch("cheetah_run", nr_envs=nr_envs, seed=0)
    native._host_reset(0)
    act_dim = native.single_action_space.shape[0]
    actions = np.zeros((nr_envs, act_dim), np.float32)
    native._host_step(actions)  # warm
    start = time.perf_counter()
    for _ in range(steps):
        native._host_step(actions)
    native_sps = steps * nr_envs / (time.perf_counter() - start)

    bridge = DMCHostEnv("cheetah", "run", nr_envs, seed=0)
    bridge._host_reset(0)
    bridge._host_step(actions)
    start = time.perf_counter()
    for _ in range(steps):
        bridge._host_step(actions)
    bridge_sps = steps * nr_envs / (time.perf_counter() - start)

    print(f"\n[native-dmc] cheetah_run @ {nr_envs} envs: "
          f"native {native_sps:,.0f} steps/s vs python bridge {bridge_sps:,.0f} steps/s "
          f"({native_sps / bridge_sps:.1f}x)")
    native.close()
    assert native_sps > 0 and bridge_sps > 0
