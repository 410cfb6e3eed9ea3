"""Parallel seeds (nr_parallel_seeds > 1) for the shared off-policy and
recurrent cores: the whole training program — per-seed state init, buffer
prefill, train scan — runs as ONE vmapped XLA program, as the reference
plumbs through every flax_full_jit family
(`rl_x/algorithms/sac/flax_full_jit/sac.py:387`,
`ppo_lstm/flax_full_jit/ppo_lstm.py`) but caps at 1.  PPO's own coverage
lives in tests/test_ppo.py::test_parallel_seeds_vmapped_training."""

import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


def _run(algo, extra):
    config = make_config(
        algo, "classic.pendulum.tpu",
        **{
            "environment.nr_envs": 8,
            "algorithm.nr_parallel_seeds": 3,
            "algorithm.logging_active": False,
            "runner.save_model": False,
            **extra,
        },
    )
    model = create_model(config)
    model.train()
    return model


OFFPOLICY_SMALL = {
    "algorithm.learning_starts": 64, "algorithm.batch_size": 32,
    "algorithm.buffer_size": 2048, "algorithm.total_timesteps": 512,
    "algorithm.evaluation_and_save_frequency": 224,
    "algorithm.logging_frequency": 112,
}


def test_offpolicy_parallel_seeds_sac():
    model = _run("sac.tpu", OFFPOLICY_SMALL)
    returns = model.eval_history["eval/episode_return"]
    assert returns.shape == (3, 2)  # [seeds, eval points]
    assert np.isfinite(returns).all()
    # independently-initialized seeds must not produce identical runs
    assert len({float(r) for r in returns[:, -1]}) > 1


def test_offpolicy_parallel_seeds_nstep_fast_family():
    """fasttd3 exercises the n-step sampler + running normalizers under the
    seed vmap (the trickiest off-policy state to carry a seed axis)."""
    model = _run("fasttd3.tpu", {
        **OFFPOLICY_SMALL,
        "algorithm.learning_starts_per_env": 8,
        "algorithm.buffer_size_per_env": 256,
    })
    returns = model.eval_history["eval/episode_return"]
    assert returns.shape[0] == 3
    assert np.isfinite(returns).all()


def test_recurrent_parallel_seeds_lstm():
    model = _run("ppo_lstm.tpu", {
        "algorithm.nr_steps": 8, "algorithm.nr_minibatches": 2,
        "algorithm.total_timesteps": 256,
        "algorithm.evaluation_and_save_frequency": 128,
    })
    returns = model.eval_history["eval/episode_return"]
    assert returns.shape == (3, 2)
    assert np.isfinite(returns).all()
    assert len({float(r) for r in returns[:, -1]}) > 1


def test_reppo_parallel_seeds():
    model = _run("reppo.tpu", {
        "algorithm.nr_steps": 8, "algorithm.nr_minibatches": 2,
        "algorithm.total_timesteps": 256,
        "algorithm.evaluation_and_save_frequency": 128,
    })
    returns = model.eval_history["eval/episode_return"]
    assert returns.shape == (3, 2)
    assert np.isfinite(returns).all()


def test_pqn_parallel_seeds_discrete():
    config = make_config(
        "pqn.tpu", "classic.cart_pole.tpu",
        **{
            "environment.nr_envs": 8, "algorithm.nr_parallel_seeds": 3,
            "algorithm.logging_active": False, "runner.save_model": False,
            "algorithm.nr_steps": 8, "algorithm.nr_minibatches": 2,
            "algorithm.total_timesteps": 256,
            "algorithm.evaluation_and_save_frequency": 128,
        },
    )
    model = create_model(config)
    model.train()
    returns = model.eval_history["eval/episode_return"]
    assert returns.shape == (3, 2)
    assert np.isfinite(returns).all()


def test_parallel_seeds_guard_rejects_callbacks():
    with pytest.raises(ValueError, match="logging_active"):
        _run("sac.tpu", {**OFFPOLICY_SMALL, "algorithm.logging_active": True})
