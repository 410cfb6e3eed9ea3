"""The Pallas kernel paths are load-bearing: with
``runner.pallas_kernels=interpret`` whole training programs route GAE and
the categorical projection through the Pallas kernels (interpreter mode on
CPU) and train to (near-)identical results as the XLA defaults."""

import jax
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.ops import _dispatch


@pytest.fixture(autouse=True)
def _reset_dispatch():
    yield
    _dispatch.set_mode("off")


def test_mode_validation():
    with pytest.raises(ValueError):
        _dispatch.set_mode("sideways")
    _dispatch.set_mode(True)
    assert _dispatch.mode() == "on" and _dispatch.use_pallas()
    _dispatch.set_mode(False)
    assert _dispatch.mode() == "off" and not _dispatch.use_pallas()


def _train_ppo(pallas_mode):
    _dispatch.set_mode(pallas_mode)
    config = make_config(
        "ppo.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 1024,
            "algorithm.nr_steps": 32,
            "algorithm.minibatch_size": 64,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_and_save_frequency": 512,
            "algorithm.logging_active": False,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    return jax.tree.leaves(model.policy_state.params)


def test_ppo_trains_through_pallas_gae_kernel():
    """Same seed, GAE through the Pallas kernel vs the XLA scan: the kernels
    are math-equivalent, so training must land on the same parameters."""
    baseline = _train_ppo("off")
    via_kernel = _train_ppo("interpret")
    for a, b in zip(baseline, via_kernel):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_c51_trains_through_pallas_projection_kernel():
    _dispatch.set_mode("interpret")
    config = make_config(
        "c51.tpu",
        "classic.cart_pole.tpu",
        **{
            "algorithm.total_timesteps": 384,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.nr_atoms": 11,
            "algorithm.logging_frequency": 64,
            "algorithm.logging_active": False,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.states["critic"].params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ant_env_steps_through_pallas_substep_kernel():
    """With the flag on, the ant env's physics routes through the Mosaic
    substep kernel (interpreter here) and matches the XLA engine path."""
    import jax.numpy as jnp

    from rlx_tpu.environments.environment_manager import get_environment_create_env

    def rollout(mode, steps=3):
        _dispatch.set_mode(mode)
        config = make_config("ppo.tpu", "locomotion.ant.tpu",
                             **{"environment.nr_envs": 8})
        train_env, eval_env = get_environment_create_env("locomotion.ant.tpu")(config)
        state = train_env.reset(jax.random.PRNGKey(0), eval_mode=True)
        action = jnp.zeros((8,) + train_env.single_action_space.shape)
        for _ in range(steps):
            state = train_env.step(state, action)
        return state

    base = rollout("off")
    via = rollout("interpret")
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(via)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
