"""Chunked vs fused training-program parity.

`runner.chunked_train` replaces the outer fused `lax.scan` with one bounded
jitted device call per eval/save iteration (rlx_tpu/algorithms/
training_program.py).  The two paths must produce IDENTICAL eval histories
at a fixed seed — this pins the refactor so they cannot silently diverge
(ADVICE r2: previously only RecurrentPPO implemented the flag and nothing
tested it).
"""

import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


def _run(algorithm, env, overrides, chunked):
    over = dict(overrides)
    over.update({
        "algorithm.evaluation_active": True,
        "algorithm.logging_active": False,
        "runner.chunked_train": chunked,
    })
    config = make_config(algorithm, env, **over)
    model = create_model(config)
    model.train()
    assert model.eval_history is not None
    return model.eval_history


CASES = [
    (
        "ppo.tpu",
        {
            "environment.nr_envs": 8, "algorithm.nr_steps": 8,
            "algorithm.minibatch_size": 16, "algorithm.total_timesteps": 128,
            "algorithm.evaluation_and_save_frequency": 64,
        },
    ),
    (
        "ppo_lstm.tpu",
        {
            "environment.nr_envs": 8, "algorithm.nr_steps": 8,
            "algorithm.nr_minibatches": 2, "algorithm.total_timesteps": 128,
            "algorithm.evaluation_and_save_frequency": 64,
            "algorithm.rnn_hidden_dim": 16,
        },
    ),
    (
        "sac.tpu",
        {
            "environment.nr_envs": 8, "algorithm.learning_starts": 16,
            "algorithm.buffer_size": 512, "algorithm.batch_size": 32,
            "algorithm.total_timesteps": 144, "algorithm.logging_frequency": 32,
            "algorithm.evaluation_and_save_frequency": 64,
        },
    ),
]


@pytest.mark.parametrize("algorithm,overrides", CASES, ids=[c[0] for c in CASES])
def test_chunked_matches_fused(algorithm, overrides):
    fused = _run(algorithm, "classic.pendulum.tpu", overrides, chunked=False)
    chunked = _run(algorithm, "classic.pendulum.tpu", overrides, chunked=True)
    assert list(fused.keys()) == list(chunked.keys())
    np.testing.assert_array_equal(fused["steps"], chunked["steps"])
    for key in fused:
        if key == "steps":
            continue
        np.testing.assert_allclose(
            fused[key], chunked[key], rtol=1e-5, atol=1e-5, err_msg=key
        )
