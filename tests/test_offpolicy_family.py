"""Smoke tests for the off-policy family: each algorithm's fused program
runs on the virtual mesh, updates params, and stays finite."""

import jax
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


def tiny(algorithm, **extra):
    base = {
        "algorithm.total_timesteps": 512,
        "algorithm.learning_starts": 128,
        "algorithm.buffer_size": 2048,
        "algorithm.batch_size": 32,
        "algorithm.logging_frequency": 64,
        "algorithm.policy_hidden_sizes": (32, 32),
        "algorithm.critic_hidden_sizes": (32, 32),
        "environment.nr_envs": 8,
        "runner.mesh_dp": -1,
    }
    base.update(extra)
    return make_config(algorithm, "classic.pendulum.tpu", **base)


@pytest.mark.parametrize("algorithm", ["td3.tpu", "ddpg.tpu"])
def test_offpolicy_algorithm_trains(algorithm):
    model = create_model(tiny(algorithm))
    initial = jax.tree.map(np.asarray, model.states["policy"].params)
    model.train()
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial, model.states["policy"].params,
    )
    assert any(jax.tree.leaves(changed)), algorithm
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all()
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_td3_save_load(tmp_path):
    config = tiny("td3.tpu", **{"runner.save_model": True})
    model = create_model(config, run_path=str(tmp_path))
    model.train()

    from rlx_tpu.algorithms.td3.tpu.td3 import TD3
    from rlx_tpu.config import create_env

    config2 = tiny("td3.tpu")
    config2.runner.load_model = str(tmp_path / "models" / "latest.model")
    train_env, eval_env = create_env(config2)
    model2 = TD3.load(config2, train_env, eval_env, str(tmp_path), None, [])
    for a, b in zip(
        jax.tree.leaves(model.states["policy"].params),
        jax.tree.leaves(model2.states["policy"].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
