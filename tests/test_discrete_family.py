"""Discrete track: CartPole golden transition + DQN/DDQN/C51/PQN smoke +
PPO-discrete path, and the C51 categorical projection analytics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.environments.classic.cart_pole.tpu.environment import CartPole
from rlx_tpu.ops.distributional import categorical_projection, hl_gauss_expectation, hl_gauss_targets


def test_cartpole_matches_gymnasium_math():
    env = CartPole(nr_envs=2, horizon=500)
    state = env.reset(jax.random.PRNGKey(0))
    x, x_dot, theta, theta_dot = (np.asarray(v) for v in state.physics)
    new_state = jax.jit(env.step)(state, jnp.array([1, 0]))

    for i, force in enumerate([10.0, -10.0]):
        total_mass = 1.1
        polemass_length = 0.05
        temp = (force + polemass_length * theta_dot[i] ** 2 * np.sin(theta[i])) / total_mass
        theta_acc = (9.8 * np.sin(theta[i]) - np.cos(theta[i]) * temp) / (
            0.5 * (4.0 / 3.0 - 0.1 * np.cos(theta[i]) ** 2 / total_mass)
        )
        x_acc = temp - polemass_length * theta_acc * np.cos(theta[i]) / total_mass
        assert np.isclose(float(new_state.physics.x[i]), x[i] + 0.02 * x_dot[i], atol=1e-6)
        assert np.isclose(float(new_state.physics.x_dot[i]), x_dot[i] + 0.02 * x_acc, atol=1e-5)
        assert np.isclose(float(new_state.physics.theta_dot[i]), theta_dot[i] + 0.02 * theta_acc, atol=1e-5)
    assert (np.asarray(new_state.reward) == 1.0).all()


def test_categorical_projection_identity_and_shift():
    atoms = jnp.linspace(-10.0, 10.0, 51)
    probs = jnp.zeros((1, 51)).at[0, 25].set(1.0)  # all mass at 0
    # identity projection
    out = categorical_projection(atoms[None], probs, -10.0, 10.0, 51)
    np.testing.assert_allclose(np.asarray(out), np.asarray(probs), atol=1e-6)
    # shift by half an atom: mass splits between neighbors
    delta = 20.0 / 50
    out = categorical_projection(atoms[None] + delta / 2, probs, -10.0, 10.0, 51)
    assert np.isclose(float(out[0, 25]), 0.5, atol=1e-5)
    assert np.isclose(float(out[0, 26]), 0.5, atol=1e-5)
    assert np.isclose(float(out.sum()), 1.0, atol=1e-5)


def test_hl_gauss_roundtrip():
    values = jnp.array([-3.2, 0.0, 7.9])
    probs = hl_gauss_targets(values, -10.0, 10.0, 101)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    logits = jnp.log(probs + 1e-9)
    recovered = hl_gauss_expectation(logits, -10.0, 10.0)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(values), atol=0.1)


@pytest.mark.parametrize("algorithm", ["dqn.tpu", "ddqn.tpu", "c51.tpu"])
def test_value_based_trains(algorithm):
    config = make_config(
        algorithm,
        "classic.cart_pole.tpu",
        **{
            "algorithm.total_timesteps": 768,
            "algorithm.learning_starts": 256,
            "algorithm.buffer_size": 4096,
            "algorithm.batch_size": 32,
            "algorithm.logging_frequency": 64,
            "algorithm.update_frequency": 1,
            "algorithm.target_update_frequency": 64,
            "algorithm.critic_hidden_sizes": (32,),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    initial = jax.tree.map(np.asarray, model.states["critic"].params)
    model.train()
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial, model.states["critic"].params,
    )
    assert any(jax.tree.leaves(changed)), algorithm
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_pqn_trains():
    config = make_config(
        "pqn.tpu",
        "classic.cart_pole.tpu",
        **{
            "algorithm.total_timesteps": 2048,
            "algorithm.nr_steps": 16,
            "algorithm.nr_minibatches": 4,
            "algorithm.critic_hidden_sizes": (32,),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.critic_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_ppo_discrete_on_cartpole():
    config = make_config(
        "ppo.tpu",
        "classic.cart_pole.tpu",
        **{
            "algorithm.total_timesteps": 2048,
            "algorithm.nr_steps": 16,
            "algorithm.minibatch_size": 32,
            "algorithm.nr_epochs": 2,
            "algorithm.evaluation_active": False,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
