"""FlashSAC exact layer zoo: projection invariants, BatchNorm streams, and
the post-update unit-norm discipline (reference:
`rl_x/algorithms/flashsac/flax/layers.py:8-127`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.algorithms.flashsac.tpu.layers import (
    FlashSACDoubleCritic,
    FlashSACPolicy,
    project_params,
)
from rlx_tpu.config import create_model, make_config


def _make_policy():
    policy = FlashSACPolicy(action_dim=3, hidden_dim=16, nr_blocks=2)
    variables = policy.init(jax.random.PRNGKey(0), jnp.zeros((4, 5)), False)
    return policy, variables


def _make_critic():
    critic = FlashSACDoubleCritic(
        hidden_dim=16, nr_blocks=2, nr_atoms=11, v_min=-5.0, v_max=5.0
    )
    variables = critic.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 5)), jnp.zeros((4, 3)), False
    )
    return critic, variables


def _assert_projected(params):
    def check(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        name = names[-1] if names else ""
        if any("BatchNorm" in n for n in names):
            return  # checked pairwise below
        if any("RMSNorm" in n for n in names) and name == "scale":
            d = leaf.shape[-1]
            np.testing.assert_allclose(
                np.linalg.norm(leaf, axis=-1), np.sqrt(d), rtol=1e-5
            )
        elif name.endswith("kernel"):
            np.testing.assert_allclose(
                np.linalg.norm(leaf, axis=-2), 1.0, rtol=1e-5
            )

    jax.tree_util.tree_map_with_path(check, params)

    def check_bn(tree, parent=""):
        if not isinstance(tree, dict):
            return
        if "BatchNorm" in parent and "scale" in tree and "bias" in tree:
            d = tree["scale"].shape[-1]
            joint = np.sqrt(
                np.sum(np.asarray(tree["scale"]) ** 2, axis=-1)
                + np.sum(np.asarray(tree["bias"]) ** 2, axis=-1)
            )
            np.testing.assert_allclose(joint, np.sqrt(d), rtol=1e-5)
            return
        for k, v in tree.items():
            check_bn(v, parent=k)

    check_bn(params)


def test_project_params_invariants_policy_and_critic():
    for variables in (_make_policy()[1], _make_critic()[1]):
        projected = project_params(variables["params"])
        _assert_projected(projected)
        # idempotent: projecting a projected tree is a no-op
        again = project_params(projected)
        for a, b in zip(jax.tree.leaves(projected), jax.tree.leaves(again)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_project_params_leaves_biases_and_running_stats_alone():
    _, variables = _make_policy()
    projected = project_params(variables["params"])

    def find(tree, name, out):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == name and not isinstance(v, dict):
                    out.append(v)
                else:
                    find(v, name, out)

    before, after = [], []
    find(variables["params"], "mean_bias", before)
    find(projected, "mean_bias", after)
    assert before and len(before) == len(after)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_policy_forward_std_bounds_and_shapes():
    policy, variables = _make_policy()
    mean, std = policy.apply(variables, jnp.ones((7, 5)), False)
    assert mean.shape == (7, 3) and std.shape == (7, 3)
    assert np.all(np.asarray(std) >= np.exp(-10.0) - 1e-8)
    assert np.all(np.asarray(std) <= np.exp(2.0) + 1e-5)


def test_critic_twin_categorical_heads():
    critic, variables = _make_critic()
    values, log_probs = critic.apply(
        variables, jnp.ones((4, 5)), jnp.ones((4, 3)), False
    )
    assert values.shape == (2, 4) and log_probs.shape == (2, 4, 11)
    # log-probs normalized per sample
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(log_probs, axis=-1)), 0.0, atol=1e-5
    )
    assert np.all(np.abs(np.asarray(values)) <= 5.0 + 1e-5)
    # twin critics have independent params -> different outputs
    assert not np.allclose(np.asarray(values[0]), np.asarray(values[1]))


def test_batchnorm_streams_mutate_only_in_train_mode():
    policy, variables = _make_policy()
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 5)) * 3.0 + 1.0
    _, mutated = policy.apply(variables, x, True, mutable=["batch_stats"])
    changed = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(variables["batch_stats"]),
            jax.tree.leaves(mutated["batch_stats"]),
        )
    ]
    assert any(changed), "train-mode forward must advance running stats"
    out1 = policy.apply(variables, x, False)
    out2 = policy.apply(variables, x, False)
    for a, b in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def trained_flashsac():
    config = make_config(
        "flashsac.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 384,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.nr_atoms": 11,
            "algorithm.logging_frequency": 64,
            "algorithm.policy_hidden_dim": 16,
            "algorithm.policy_nr_blocks": 1,
            "algorithm.critic_hidden_dim": 16,
            "algorithm.critic_nr_blocks": 1,
            "algorithm.logging_active": False,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    return model


def test_update_preserves_projection(trained_flashsac):
    """After training steps, kernels are STILL unit-norm — the projection is
    applied after every gradient step, not just at init."""
    model = trained_flashsac
    _assert_projected(model.states["policy"].params)
    _assert_projected(model.states["critic"].params)


def test_update_advances_all_batchnorm_streams(trained_flashsac):
    model = trained_flashsac
    critic_state = model.states["critic"]
    fresh = model.critic.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2,) + model.os_shape),
        jnp.zeros((2, model.action_dim)),
        False,
    )["batch_stats"]
    for name, stats in [
        ("online", critic_state.batch_stats),
        ("target", critic_state.target_batch_stats),
    ]:
        changed = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(fresh), jax.tree.leaves(stats))
        ]
        assert any(changed), f"{name} critic batch stats never advanced"
