"""Running normalizers as pure pytree states (in-jit friendly).

Semantics match the reference's SimbaV2/FastTD3/FlashSAC normalizers
(`rl_x/algorithms/simbav2/flax/normalizer.py:4-60`): Welford-merged running
mean/var for observations; discounted-return RMS with a G_max floor for
rewards.  States are plain dicts of jnp arrays so they live inside the fused
training program and checkpoint with the model.
"""

import jax.numpy as jnp


def obs_normalizer_init(shape):
    return {
        "mean": jnp.zeros(shape, jnp.float32),
        "var": jnp.ones(shape, jnp.float32),
        "count": jnp.asarray(1e-4, jnp.float32),
    }


def obs_normalizer_update(state, batch):
    """Welford parallel merge with a batch of observations [B, obs]."""
    batch_mean = batch.mean(axis=0)
    batch_var = batch.var(axis=0)
    batch_count = jnp.float32(batch.shape[0])
    delta = batch_mean - state["mean"]
    total = state["count"] + batch_count
    new_mean = state["mean"] + delta * batch_count / total
    m2 = state["var"] * state["count"] + batch_var * batch_count + delta**2 * state["count"] * batch_count / total
    return {"mean": new_mean, "var": m2 / total, "count": total}


def obs_normalize(state, observation, epsilon=1e-8):
    return (observation - state["mean"]) / jnp.sqrt(state["var"] + epsilon)


def reward_normalizer_init(nr_envs):
    return {
        "g": jnp.zeros((nr_envs,), jnp.float32),
        "g_max": jnp.zeros((), jnp.float32),
        "mean": jnp.zeros((), jnp.float32),
        "var": jnp.ones((), jnp.float32),
        "count": jnp.asarray(1e-4, jnp.float32),
    }


def reward_normalizer_update(state, reward, terminated, truncated, gamma):
    done = (terminated | truncated).astype(jnp.float32)
    g = gamma * (1.0 - done) * state["g"] + reward
    g_max = jnp.maximum(state["g_max"], jnp.abs(g).max())
    sample_mean = g.mean()
    sample_var = g.var()
    sample_count = jnp.float32(g.shape[0])
    delta = sample_mean - state["mean"]
    total = state["count"] + sample_count
    ratio = sample_count / total
    new_mean = state["mean"] + delta * ratio
    m2 = state["var"] * state["count"] + sample_var * sample_count + delta**2 * state["count"] * ratio
    return {"g": g, "g_max": g_max, "mean": new_mean, "var": m2 / total, "count": total}


def reward_normalize(state, reward, normalized_g_max=10.0, epsilon=1e-8):
    denom = jnp.maximum(jnp.sqrt(state["var"] + epsilon), state["g_max"] / normalized_g_max)
    return reward / denom
