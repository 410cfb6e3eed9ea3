"""REDQ/DroQ/AQE high-UTD ensemble variants: fused programs run, params
update, stay finite."""

import jax
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


@pytest.mark.parametrize("algorithm", ["redq.tpu", "droq.tpu", "aqe.tpu"])
def test_ensemble_sac_trains(algorithm):
    config = make_config(
        algorithm,
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 320,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.q_update_steps": 3,
            "algorithm.logging_frequency": 64,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    nr_critics = config.algorithm.nr_critics
    # ensemble axis present on critic kernels
    some_kernel = jax.tree.leaves(model.states["critic"].params)[0]
    assert np.asarray(some_kernel).shape[0] == nr_critics

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


def test_tqc_trains():
    config = make_config(
        "tqc.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 320,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.logging_frequency": 64,
            "algorithm.nr_atoms_per_net": 5,
            "algorithm.nr_dropped_atoms_per_net": 1,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all()
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_crossq_trains():
    config = make_config(
        "crossq.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 320,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.logging_frequency": 64,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all()
    # batch stats actually moved
    stats = model.states["critic"].batch_stats
    means = [np.asarray(v) for k, v in jax.tree_util.tree_flatten_with_path(stats)[0]
             if "mean" in jax.tree_util.keystr(k)]
    assert any(np.abs(m).max() > 0 for m in means)
    returns = model.test(1)
    assert np.isfinite(returns[0])


from rlx_tpu.config import make_config as _mk


@pytest.mark.parametrize("algorithm,extra", [
    ("bro.tpu", {"algorithm.updates_per_step": 2, "algorithm.nr_quantiles": 9,
                 "algorithm.policy_hidden_dim": 16, "algorithm.policy_nr_blocks": 1,
                 "algorithm.critic_hidden_dim": 16, "algorithm.critic_nr_blocks": 1,
                 "algorithm.first_reset_step": 160, "algorithm.reset_interval": 80}),
    ("xqc.tpu", {"algorithm.nr_atoms": 11,
                 "algorithm.policy_hidden_dim": 16, "algorithm.policy_nr_blocks": 1,
                 "algorithm.critic_hidden_dim": 16, "algorithm.critic_nr_blocks": 1}),
    ("simbav2.tpu", {"algorithm.nr_atoms": 11,
                     "algorithm.policy_hidden_dim": 16, "algorithm.policy_nr_blocks": 1,
                     "algorithm.critic_hidden_dim": 16, "algorithm.critic_nr_blocks": 1}),
])
def test_scaled_network_family_trains(algorithm, extra):
    base = {
        "algorithm.total_timesteps": 320,
        "algorithm.learning_starts": 128,
        "algorithm.buffer_size": 2048,
        "algorithm.batch_size": 32,
        "algorithm.logging_frequency": 64,
        "environment.nr_envs": 8,
        "runner.mesh_dp": -1,
    }
    base.update(extra)
    model = create_model(_mk(algorithm, "classic.pendulum.tpu", **base))
    model.train()
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all(), algorithm
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_weight_norm_projection_unit_norms():
    import jax
    import jax.numpy as jnp
    import flax.traverse_util
    from rlx_tpu.algorithms.xqc.tpu.xqc import XQCPolicy
    from rlx_tpu.models.weight_norm import weight_norm_params

    policy = XQCPolicy(action_dim=3, hidden_dim=16, nr_blocks=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    params = jax.tree.map(lambda p: p * 3.7, params)  # knock off unit norm
    normed = weight_norm_params(params)

    flat = flax.traverse_util.flatten_dict(normed, sep="/")
    for key, kernel in flat.items():
        if not key.endswith("/kernel"):
            continue
        path = key[: -len("/kernel")]
        leaf = path.split("/")[-1]
        if leaf in ("mean", "log_std", "value"):
            norms = jnp.linalg.norm(kernel, axis=-2)
        elif "Dense" in leaf:
            bias = flat[path + "/bias"]
            norms = jnp.sqrt((kernel**2).sum(-2) + bias**2)
        else:
            continue
        assert jnp.allclose(norms, 1.0, atol=1e-5), key
    # a LayerNorm scale must be untouched
    orig_flat = flax.traverse_util.flatten_dict(params, sep="/")
    ln_keys = [k for k in orig_flat if "LayerNorm" in k]
    assert ln_keys and all(jnp.array_equal(orig_flat[k], flat[k]) for k in ln_keys)
