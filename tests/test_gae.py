"""GAE against a naive python reference, including termination/truncation
bootstrapping (the most bug-prone correctness detail per SURVEY.md §7)."""

import jax.numpy as jnp
import numpy as np

from rlx_tpu.ops.gae import gae_advantages


def naive_gae(rewards, values, next_values, terminations, gamma, lam):
    T, B = rewards.shape
    advantages = np.zeros((T, B))
    for b in range(B):
        next_adv = 0.0
        for t in reversed(range(T)):
            nonterminal = 1.0 - terminations[t, b]
            delta = rewards[t, b] + gamma * next_values[t, b] * nonterminal - values[t, b]
            next_adv = delta + gamma * lam * nonterminal * next_adv
            advantages[t, b] = next_adv
    return advantages, advantages + values


def test_gae_matches_naive():
    rng = np.random.default_rng(0)
    T, B = 17, 5
    rewards = rng.normal(size=(T, B))
    values = rng.normal(size=(T, B))
    next_values = rng.normal(size=(T, B))
    terminations = rng.random((T, B)) < 0.2

    adv, ret = gae_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(next_values),
        jnp.asarray(terminations), 0.99, 0.95,
    )
    exp_adv, exp_ret = naive_gae(rewards, values, next_values, terminations.astype(float), 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), exp_adv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), exp_ret, rtol=1e-5, atol=1e-5)


def test_gae_truncation_bootstraps():
    """A truncated episode (termination=0) must bootstrap from next_values."""
    T, B = 1, 1
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    next_values = jnp.full((T, B), 10.0)
    # truncation: terminations stays False
    adv, _ = gae_advantages(rewards, values, next_values, jnp.zeros((T, B), bool), 0.5, 1.0)
    assert np.isclose(float(adv[0, 0]), 1.0 + 0.5 * 10.0)
    # true termination: no bootstrap
    adv, _ = gae_advantages(rewards, values, next_values, jnp.ones((T, B), bool), 0.5, 1.0)
    assert np.isclose(float(adv[0, 0]), 1.0)


def test_pallas_gae_matches_scan():
    """The fused Pallas kernel (interpret mode on CPU) must match the scan."""
    from rlx_tpu.ops.gae_pallas import gae_advantages_pallas

    rng = np.random.default_rng(5)
    T, B = 24, 16
    rewards = jnp.asarray(rng.normal(size=(T, B)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(T, B)), jnp.float32)
    next_values = jnp.asarray(rng.normal(size=(T, B)), jnp.float32)
    terminations = jnp.asarray(rng.random((T, B)) < 0.15)

    adv_s, ret_s = gae_advantages(rewards, values, next_values, terminations, 0.99, 0.95)
    adv_p, ret_p = gae_advantages_pallas(
        rewards, values, next_values, terminations, 0.99, 0.95, block_b=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(adv_p), np.asarray(adv_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret_p), np.asarray(ret_s), rtol=1e-5, atol=1e-5)
