"""Trust-region projection analytics + PPO-DTRL and FlashSAC smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.algorithms.ppo_dtrl.tpu.trust_region import (
    cov_projection,
    entropy_projection,
    gaussian_kl_parts,
    kl_projection,
    mean_projection,
)
from rlx_tpu.config import create_model, make_config


def test_mean_projection_enforces_bound():
    old_mean = jnp.zeros((4, 3))
    old_std = jnp.ones((4, 3))
    mean = jnp.array([[2.0, 0, 0], [0.05, 0, 0], [0, 3.0, 4.0], [0, 0, 0]])
    bound = 0.1
    proj, _ = mean_projection(mean, old_mean, old_std, bound)
    mean_part, _ = gaussian_kl_parts(proj, old_std, old_mean, old_std)
    assert (np.asarray(mean_part) <= bound + 1e-4).all()
    # inside-bound rows untouched
    np.testing.assert_allclose(np.asarray(proj[1]), np.asarray(mean[1]), atol=1e-6)


def test_cov_projection_enforces_bound():
    old_std = jnp.ones((5, 4))
    std = jnp.array([
        [3.0, 3.0, 3.0, 3.0],
        [0.2, 0.2, 0.2, 0.2],
        [1.01, 0.99, 1.0, 1.0],   # inside the bound
        [5.0, 0.1, 1.0, 1.0],
        [0.5, 2.0, 0.7, 1.5],
    ])
    bound = 0.01
    proj_std, eta = cov_projection(std, old_std, bound)
    _, cov_part = gaussian_kl_parts(jnp.zeros_like(std), proj_std, jnp.zeros_like(std), old_std)
    assert (np.asarray(cov_part) <= bound * 1.2).all(), cov_part
    # inside-bound row untouched, eta zero
    np.testing.assert_allclose(np.asarray(proj_std[2]), np.asarray(std[2]), atol=1e-6)
    assert float(eta[2]) == 0.0


def test_projection_is_differentiable():
    def loss(std):
        proj = kl_projection(
            jnp.ones((2, 3)) * 0.5, std, jnp.zeros((2, 3)), jnp.ones((2, 3)), 0.05, 0.01
        )
        return (proj["mean"] ** 2).sum() + (proj["std"] ** 2).sum()

    g = jax.grad(loss)(jnp.full((2, 3), 2.0))
    assert np.isfinite(np.asarray(g)).all()
    assert (np.abs(np.asarray(g)) > 0).any()


def test_entropy_projection():
    log_std = jnp.full((2, 4), -3.0)
    projected = entropy_projection(log_std, min_entropy=0.0)
    dim = 4
    entropy = 0.5 * dim * np.log(2 * np.pi * np.e) + np.asarray(projected).sum(-1)
    assert (entropy >= -1e-4).all()


def test_ppo_dtrl_trains():
    config = make_config(
        "ppo_dtrl.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 512,
            "algorithm.nr_steps": 16,
            "algorithm.minibatch_size": 32,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_active": False,
            "algorithm.policy_hidden_sizes": (32, 32),
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_flashsac_trains():
    config = make_config(
        "flashsac.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 320,
            "algorithm.learning_starts": 128,
            "algorithm.buffer_size": 2048,
            "algorithm.batch_size": 32,
            "algorithm.nr_atoms": 11,
            "algorithm.logging_frequency": 64,
            "algorithm.policy_hidden_dim": 16,
            "algorithm.policy_nr_blocks": 1,
            "algorithm.critic_hidden_dim": 16,
            "algorithm.critic_nr_blocks": 1,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.states):
        assert np.isfinite(np.asarray(leaf)).all()
    # zeta noise state advanced
    assert int(model.states["noise"]["count"]) > 0
    returns = model.test(1)
    assert np.isfinite(returns[0])
