"""RoboCup soccer locomotion family: gait-phase manager semantics, the
soccer reward deltas, the fixed action delay, PPO-GRU smoke training, and
the RCSSServerMJ deployment conversion (flax -> torch equivalence).

Mirrors the behavioral contract of
`rl_x/environments/custom_mujoco/robocup_soccer/locomotion/mjx/` (which
ships without tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.environments.environment_manager import get_environment_create_env


def _make_env(nr_envs=4, **overrides):
    flat = {"environment.nr_envs": nr_envs}
    flat.update(overrides)
    config = make_config("ppo.tpu", "locomotion.soccer.tpu", **flat)
    env, _ = get_environment_create_env("locomotion.soccer.tpu")(config)
    return env


@pytest.fixture(scope="module")
def env():
    return _make_env(nr_envs=4, **{"environment.episode_length_in_seconds": 2})


def test_soccer_env_contract(env):
    # Booster T1: 23 actuators, heel+toe spheres = 2 logical feet
    assert env.single_action_space.shape[0] == 23
    assert env.nr_feet == 4 and len(env.foot_groups) == 2

    # 4 gait-phase features appended, visible to BOTH policy and critic
    assert len(env.extra_obs_idx) == 4
    pol = set(np.asarray(env.policy_observation_indices).tolist())
    cri = set(np.asarray(env.critic_observation_indices).tolist())
    gait = set(np.asarray(env.extra_obs_idx).tolist())
    assert gait.issubset(pol) and gait.issubset(cri)

    # fixed 1-control-step action delay (20 ms): min == max == nr_substeps
    assert env.action_delay.min_delay_substeps == env.action_delay.max_delay_substeps
    assert env.action_delay.min_delay_substeps == round(0.02 / env.timestep)

    state = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(state.observation)
    assert np.isfinite(obs).all()
    # at reset in train mode, phase offsets are canonical [0, -pi]
    # -> features sin/cos of (phase + dt): anti-phase feet
    feats = obs[:, np.asarray(env.extra_obs_idx)]
    assert np.allclose(feats[:, 0], -feats[:, 1], atol=1e-5)  # sin antisymmetric


def test_gait_phase_advances_and_resamples(env):
    state = env.reset(jax.random.PRNGKey(1))
    phase0 = np.asarray(state.physics["internal"]["gait_phase"])
    step = jax.jit(env.step)
    action = jnp.broadcast_to(env.single_action_space.center, (4, 23))
    state = step(state, action)
    phase1 = np.asarray(state.physics["internal"]["gait_phase"])
    dt_expected = 2 * np.pi * env.dt * np.asarray(state.physics["internal"]["gait_freq"])
    wrapped = (phase0 + dt_expected[:, None] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(phase1, wrapped, atol=1e-5)
    # anti-phase invariant is preserved under stepping
    gap = (phase1[:, 0] - phase1[:, 1] + np.pi) % (2 * np.pi) - np.pi
    assert np.allclose(np.abs(gap), np.pi, atol=1e-4)


def test_soccer_reward_terms_in_info(env):
    state = env.reset(jax.random.PRNGKey(2))
    # eval mode drives curriculum to 1 so the new terms are non-trivial
    eval_state = env.reset(jax.random.PRNGKey(3), eval_mode=True)
    step = jax.jit(env.step)
    action = jnp.broadcast_to(env.single_action_space.center, (4, 23))
    for _ in range(3):
        eval_state = step(eval_state, action)
    for key in ("reward/feet_phase", "reward/feet_flat", "reward/feet_yaw"):
        assert key in eval_state.info
        assert np.isfinite(np.asarray(eval_state.info[key])).all()
    # standing near nominal with zero-ish tilt: feet_flat penalty ~ 0,
    # feet_phase positive (it is a tracking-style exp reward)
    assert np.asarray(eval_state.info["reward/feet_phase"]).min() > 0.0


@pytest.mark.slow
def test_ppo_gru_smoke_on_soccer():
    config = make_config(
        "ppo_gru.tpu",
        "locomotion.soccer.tpu",
        **{
            "algorithm.total_timesteps": 2 * 4 * 8,
            "algorithm.nr_steps": 8,
            "algorithm.nr_minibatches": 2,
            "algorithm.nr_epochs": 1,
            "environment.nr_envs": 4,
            "environment.episode_length_in_seconds": 1,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_deployment_conversion_matches_flax():
    """convert.py's param mapping: the torch GRU policy must reproduce the
    flax policy's action means step for step."""
    torch = pytest.importorskip("torch")

    import importlib.util
    import os

    base = "rlx_tpu/environments/locomotion/soccer/deployment"

    def load(name):
        spec = importlib.util.spec_from_file_location(name, os.path.join(base, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    torch_policy_mod = load("torch_policy")
    import sys

    sys.modules["torch_policy"] = torch_policy_mod
    convert = load("convert")

    config = make_config(
        "ppo_gru.tpu", "locomotion.soccer.tpu",
        **{"environment.nr_envs": 2, "environment.episode_length_in_seconds": 1},
    )
    model = create_model(config)

    sd, arch = convert.convert_policy_params(jax.device_get(model.policy_state.params))
    tp = torch_policy_mod.TorchPolicyGRU(**arch)
    tp.load_state_dict(sd)

    env = model.train_env
    obs_full = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (2, env.single_observation_space.shape[0]))
    ).astype(np.float32)
    pol_idx = np.asarray(env.policy_observation_indices)

    flax_carry = model.policy.initialize_carry(2)
    torch_carry = tp.initial_carry(2)
    for t in range(4):
        obs_t = obs_full + 0.1 * t
        mean, _, flax_carry = model.policy.apply(
            model.policy_state.params, jnp.asarray(obs_t), flax_carry,
            method=model.policy.one_step,
        )
        tmean, torch_carry = tp(torch.from_numpy(obs_t[:, pol_idx]), torch_carry)
        np.testing.assert_allclose(
            np.asarray(mean), tmean.numpy(), rtol=1e-4, atol=1e-5,
        )
