"""Golden tests: native C++ MuJoCo batcher vs gymnasium's own v5 envs.

From an identical (qpos, qvel) state and identical action sequences, the
C++ batcher (envbatch_mujoco.cpp) must reproduce gymnasium's observations,
rewards, and termination flags step for step — pinning the re-implemented
Gym v5 task semantics (reward weights, healthy ranges, obs layout,
frame skips) against the original.
"""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from rlx_tpu.environments.native.batcher import MujocoNativeEnvBatch

CASES = [
    ("hopper", "Hopper-v5"),
    ("half_cheetah", "HalfCheetah-v5"),
    ("walker2d", "Walker2d-v5"),
]


@pytest.mark.parametrize("task,gym_id", CASES, ids=[c[0] for c in CASES])
def test_native_matches_gymnasium(task, gym_id):
    gym_env = gymnasium.make(gym_id)
    gym_env.reset(seed=7)
    native = MujocoNativeEnvBatch(task, nr_envs=2, seed=7, nr_threads=1)
    native._host_reset(0)

    data = gym_env.unwrapped.data
    qpos = np.array(data.qpos)
    qvel = np.array(data.qvel)
    native.set_state(0, qpos, qvel)

    rng = np.random.default_rng(3)
    act_dim = native.single_action_space.shape[0]
    native_done = False
    for step in range(40):
        action = rng.uniform(-1.0, 1.0, act_dim).astype(np.float32)
        gym_obs, gym_reward, gym_term, gym_trunc, _ = gym_env.step(action)

        actions = np.zeros((2, act_dim), np.float32)
        actions[0] = action
        obs, final_obs, reward, term, trunc, _ = native._host_step(actions)

        # the native batcher auto-resets; compare via final_obs (pre-reset)
        np.testing.assert_allclose(
            final_obs[0], gym_obs, rtol=1e-4, atol=1e-5,
            err_msg=f"{task} obs diverged at step {step}",
        )
        np.testing.assert_allclose(
            reward[0], gym_reward, rtol=1e-4, atol=1e-5,
            err_msg=f"{task} reward diverged at step {step}",
        )
        assert bool(term[0]) == bool(gym_term), f"{task} termination at step {step}"
        if gym_term or gym_trunc:
            break
    native.close()
    gym_env.close()


def test_horizon_and_spaces():
    native = MujocoNativeEnvBatch("half_cheetah", nr_envs=4, seed=0, nr_threads=1)
    assert native.horizon == 1000
    assert native.single_observation_space.shape == (17,)
    assert native.single_action_space.shape == (6,)
    np.testing.assert_allclose(np.asarray(native.single_action_space.low), -1.0)
    np.testing.assert_allclose(np.asarray(native.single_action_space.high), 1.0)
    obs = native._host_reset(0)
    assert obs.shape == (4, 17) and np.isfinite(obs).all()
    # episodes never terminate; stats stay zero until truncation
    actions = np.zeros((4, 6), np.float32)
    for _ in range(5):
        obs, _, reward, term, trunc, stats = native._host_step(actions)
    assert not term.any() and not trunc.any()
    assert (stats == 0).all()
    native.close()


def test_hopper_termination_on_fall():
    native = MujocoNativeEnvBatch("hopper", nr_envs=1, seed=0, nr_threads=1)
    native._host_reset(0)
    qpos, qvel = native.get_state(0, 6, 6)
    qpos[1] = 0.5  # below healthy_z = 0.7
    native.set_state(0, qpos, qvel)
    _, _, _, term, _, stats = native._host_step(np.zeros((1, 3), np.float32))
    assert bool(term[0])
    assert stats[0, 1] == 1.0  # episode ended at length 1
