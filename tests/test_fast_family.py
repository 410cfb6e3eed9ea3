"""FastTD3/FastSAC recipes: distributional critics + n-step + normalizers."""

import jax
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


@pytest.mark.parametrize("algorithm", ["fasttd3.tpu", "fastsac.tpu"])
@pytest.mark.parametrize("n_step", [1, 3])
def test_fast_family_trains(algorithm, n_step):
    config = make_config(
        algorithm,
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 320,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.n_step": n_step,
            "algorithm.nr_atoms": 11,
            "algorithm.logging_frequency": 64,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    initial = jax.tree.map(np.asarray, model.states["policy"].params)
    model.train()
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial, model.states["policy"].params,
    )
    assert any(jax.tree.leaves(changed))
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all()
    # normalizer actually saw data
    assert float(model.states["obs_normalizer"]["count"]) > 100
    returns = model.test(1)
    assert np.isfinite(returns[0])


@pytest.mark.parametrize("algorithm", ["mpo.tpu", "fastmpo.tpu"])
def test_mpo_family_trains(algorithm):
    overrides = {
        "algorithm.total_timesteps": 320,
        "algorithm.batch_size": 16,
        "algorithm.action_sampling_number": 4,
        "algorithm.nr_atoms": 11,
        "algorithm.logging_frequency": 64,
        "algorithm.policy_hidden_sizes": (32, 32),
        "algorithm.critic_hidden_sizes": (32, 32),
        "environment.nr_envs": 8,
        "runner.mesh_dp": -1,
    }
    if algorithm == "mpo.tpu":
        overrides.update({
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.actor_update_period": 4,
            "algorithm.target_network_update_period": 2,
        })
    else:
        overrides.update({
            "algorithm.learning_starts_per_env": 16,
            "algorithm.buffer_size_per_env": 256,
            "algorithm.policy_network_type": "mpo",
            "algorithm.critic_network_type": "mpo",
            "algorithm.nr_critic_updates_per_policy_update": 2,
            "algorithm.nr_policy_updates_per_step": 1,
        })
    config = make_config(algorithm, "classic.pendulum.tpu", **overrides)
    model = create_model(config)
    initial = jax.tree.map(np.asarray, model.states["policy"].params)
    model.train()
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial, model.states["policy"].params,
    )
    assert any(jax.tree.leaves(changed))
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all()
    # eta dual moved from init
    eta0 = float(np.asarray(model.states["duals"].params["params"]["log_eta"]))
    assert eta0 != 10.0
    if algorithm == "fastmpo.tpu":
        # dual critic: ensemble axis of 2 on every critic kernel
        kernel = jax.tree.leaves(model.states["critic"].params)[0]
        assert np.asarray(kernel).shape[0] == 2
        # normalizer fed from sampled batches
        assert float(model.states["obs_normalizer"]["count"]) > 0
    returns = model.test(1)
    assert np.isfinite(returns[0])
