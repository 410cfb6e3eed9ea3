"""Distributional ops: the three C51 projection implementations (scatter,
dense hat-kernel, Pallas interpret) agree; HL-Gauss targets behave."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.ops.distributional import (
    categorical_projection,
    categorical_projection_dense,
    hl_gauss_expectation,
    hl_gauss_targets,
)
from rlx_tpu.ops.projection_pallas import categorical_projection_pallas

V_MIN, V_MAX, ATOMS = -10.0, 10.0, 101


def _random_case(key, batch=37):
    kz, kp = jax.random.split(key)
    # positions straddle the support (clipping paths) and hit exact atoms
    z = jax.random.uniform(kz, (batch, ATOMS), minval=-14.0, maxval=14.0)
    z = z.at[0, :3].set(jnp.asarray([V_MIN, 0.0, V_MAX]))  # exact-atom cases
    logits = jax.random.normal(kp, (batch, ATOMS))
    p = jax.nn.softmax(logits, axis=-1)
    return z, p


def test_dense_matches_scatter():
    z, p = _random_case(jax.random.PRNGKey(0))
    ref = categorical_projection(z, p, V_MIN, V_MAX, ATOMS)
    dense = categorical_projection_dense(z, p, V_MIN, V_MAX, ATOMS)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref), atol=1e-5)
    # mass is conserved
    np.testing.assert_allclose(np.asarray(dense.sum(-1)), 1.0, atol=1e-5)


def test_pallas_matches_scatter():
    z, p = _random_case(jax.random.PRNGKey(1))
    ref = categorical_projection(z, p, V_MIN, V_MAX, ATOMS)
    ker = categorical_projection_pallas(
        z, p, V_MIN, V_MAX, ATOMS, block_n=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-5)


def test_dense_projection_gradients_flow():
    z, p = _random_case(jax.random.PRNGKey(2), batch=4)

    def loss(probs):
        out = categorical_projection_dense(z, probs, V_MIN, V_MAX, ATOMS)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_hl_gauss_roundtrip():
    values = jnp.asarray([-5.0, 0.0, 3.3])
    probs = hl_gauss_targets(values, V_MIN, V_MAX, 64)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    logits = jnp.log(jnp.maximum(probs, 1e-12))
    recovered = hl_gauss_expectation(logits, V_MIN, V_MAX)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(values), atol=0.2)
