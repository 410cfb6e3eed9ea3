"""SAC end-to-end on the virtual mesh: fused program runs, buffer is sharded,
params update and stay finite; save/load roundtrip."""

import jax
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


def tiny_config(**overrides):
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
    base.update(overrides)
    return make_config("sac.tpu", "classic.pendulum.tpu", **base)


def test_sac_train_runs_and_updates():
    model = create_model(tiny_config())
    initial = jax.tree.map(np.asarray, model.policy_state.params)
    model.train()
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial, model.policy_state.params,
    )
    assert any(jax.tree.leaves(changed))
    for leaf in jax.tree.leaves((model.policy_state.params, model.critic_state.params)):
        assert np.isfinite(np.asarray(leaf)).all()
    # alpha moved from its init
    alpha = float(np.exp(np.asarray(model.entropy_coefficient_state.params["params"]["log_alpha"])))
    assert alpha != 1.0


def test_sac_save_load_roundtrip(tmp_path):
    config = tiny_config(**{"runner.save_model": True})
    model = create_model(config, run_path=str(tmp_path))
    model.train()

    from rlx_tpu.algorithms.sac.tpu.sac import SAC
    from rlx_tpu.config import create_env

    config2 = tiny_config()
    config2.runner.load_model = str(tmp_path / "models" / "latest.model")
    train_env, eval_env = create_env(config2)
    model2 = SAC.load(config2, train_env, eval_env, str(tmp_path), None, [])
    for a, b in zip(
        jax.tree.leaves(model.policy_state.params), jax.tree.leaves(model2.policy_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    returns = model2.test(1)
    assert np.isfinite(returns[0])


@pytest.mark.slow
def test_sac_learns_pendulum():
    config = make_config(
        "sac.tpu",
        "classic.pendulum.tpu",
        **{
            # 30k with a single test episode was marginal (the same recipe's
            # TPU curve crosses -500 only around ~26k; a slow seed draw
            # tail-sampled -1192) — 40k + a 3-episode mean is robustly past
            # the knee without changing what the test proves
            "algorithm.total_timesteps": 40_000,
            "algorithm.learning_starts": 1_000,
            "algorithm.buffer_size": 50_000,
            "algorithm.batch_size": 128,
            "algorithm.logging_frequency": 2_000,
            "algorithm.evaluation_active": False,
            "environment.nr_envs": 8,
        },
    )
    model = create_model(config)
    model.train()
    returns = model.test(3)
    assert sum(returns) / len(returns) > -500, returns
