"""Replay buffer: circular writes, uniform and shard-local sampling, n-step."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.ops import replay_buffer as rb


def make_buffer(capacity=4, nr_envs=2):
    return rb.create(capacity, nr_envs, {
        "observation": ((3,), jnp.float32),
        "next_observation": ((3,), jnp.float32),
        "action": ((1,), jnp.float32),
        "reward": ((), jnp.float32),
        "terminated": ((), jnp.float32),
        "truncated": ((), jnp.float32),
    })


def row(value, nr_envs=2):
    return {
        "observation": jnp.full((nr_envs, 3), value),
        "next_observation": jnp.full((nr_envs, 3), value + 0.5),
        "action": jnp.full((nr_envs, 1), value),
        "reward": jnp.full((nr_envs,), value),
        "terminated": jnp.zeros(nr_envs),
        "truncated": jnp.zeros(nr_envs),
    }


def test_circular_write_and_size():
    buffer = make_buffer()
    for i in range(6):  # wraps capacity 4
        buffer = rb.add(buffer, row(float(i)))
    assert int(buffer.size) == 4
    assert int(buffer.pos) == 2
    # oldest rows (0, 1) overwritten by (4, 5)
    np.testing.assert_allclose(np.asarray(buffer.data["reward"][0]), 4.0)
    np.testing.assert_allclose(np.asarray(buffer.data["reward"][1]), 5.0)
    np.testing.assert_allclose(np.asarray(buffer.data["reward"][2]), 2.0)


def test_sample_only_filled_rows():
    buffer = make_buffer(capacity=8)
    for i in range(3):
        buffer = rb.add(buffer, row(float(i + 1)))
    batch = rb.sample(buffer, jax.random.PRNGKey(0), 256, shard_local=False)
    rewards = np.asarray(batch["reward"])
    assert set(np.unique(rewards)).issubset({1.0, 2.0, 3.0})
    assert batch["observation"].shape == (256, 3)


def test_shard_local_sampling_stratifies_envs():
    buffer = rb.create(4, 8, {"observation": ((1,), jnp.float32), "next_observation": ((1,), jnp.float32)})
    # mark each env with its index
    data = {k: jnp.broadcast_to(jnp.arange(8.0)[None, :, None], (4, 8, 1)) for k in buffer.data}
    buffer = rb.set_data(buffer, data).replace(size=jnp.asarray(4, jnp.int32))
    batch = rb.sample(buffer, jax.random.PRNGKey(0), 16, shard_local=True, dp_size=4)
    env_ids = np.asarray(batch["observation"][:, 0])
    # index i reads shard i % 4 => env in [2*(i%4), 2*(i%4)+1]
    for i, e in enumerate(env_ids):
        shard = i % 4
        assert 2 * shard <= e <= 2 * shard + 1


def test_packed_and_fallback_layouts_agree():
    """Flat fields pack into one [capacity, nr_envs, D] array (single-gather
    sampling); image-shaped fields fall back to dict-of-arrays.  Both layouts
    must expose identical .data and identical samples."""
    specs = {
        "observation": ((3,), jnp.float32),
        "next_observation": ((3,), jnp.float32),
        "action": ((), jnp.int32),
        "reward": ((), jnp.float32),
        "terminated": ((), jnp.float32),
        "truncated": ((), jnp.float32),
    }
    packed = rb.create(4, 2, specs)
    assert packed.packed
    image_specs = dict(specs, observation=((4, 4, 2), jnp.uint8),
                       next_observation=((4, 4, 2), jnp.uint8))
    fallback = rb.create(4, 2, image_specs)
    assert not fallback.packed

    for i in range(3):
        tr = row(float(i))
        tr["action"] = jnp.full((2,), i, jnp.int32)
        packed = rb.add(packed, tr)
        tr_img = dict(tr)
        tr_img["observation"] = jnp.full((2, 4, 4, 2), i, jnp.uint8)
        tr_img["next_observation"] = jnp.full((2, 4, 4, 2), i, jnp.uint8)
        fallback = rb.add(fallback, tr_img)

    assert packed.data["action"].dtype == jnp.int32
    np.testing.assert_allclose(np.asarray(packed.data["reward"][:3, 0]), [0, 1, 2])
    b1 = rb.sample(packed, jax.random.PRNGKey(3), 64, shard_local=False)
    b2 = rb.sample(fallback, jax.random.PRNGKey(3), 64, shard_local=False)
    assert b1["action"].dtype == jnp.int32
    np.testing.assert_allclose(np.asarray(b1["reward"]), np.asarray(b2["reward"]))
    assert b2["observation"].shape == (64, 4, 4, 2) and b2["observation"].dtype == jnp.uint8


def test_nstep_packed_matches_fallback():
    """Packed-mode n-step (one [batch, n]-row gather) must reproduce the
    per-field-gather fallback exactly."""
    specs = {
        "observation": ((3,), jnp.float32),
        "next_observation": ((3,), jnp.float32),
        "action": ((1,), jnp.float32),
        "reward": ((), jnp.float32),
        "terminated": ((), jnp.float32),
        "truncated": ((), jnp.float32),
    }
    packed = rb.create(8, 2, specs)
    rng = np.random.RandomState(0)
    for i in range(11):  # wraps capacity 8
        tr = row(float(i))
        tr["reward"] = jnp.asarray(rng.randn(2).astype(np.float32))
        tr["terminated"] = jnp.asarray((rng.rand(2) < 0.3).astype(np.float32))
        packed = rb.add(packed, tr)
    fallback = packed.replace(storage=dict(packed.data), layout=None)
    b1 = rb.sample_nstep(packed, jax.random.PRNGKey(5), 128, n_step=3, gamma=0.9, shard_local=False)
    b2 = rb.sample_nstep(fallback, jax.random.PRNGKey(5), 128, n_step=3, gamma=0.9, shard_local=False)
    for k in b1:
        np.testing.assert_allclose(np.asarray(b1[k]), np.asarray(b2[k]), rtol=1e-6, err_msg=k)


def test_nstep_discounted_sum_and_termination_cut():
    buffer = make_buffer(capacity=8, nr_envs=1)
    # rewards 1, 2, 4 with termination after second transition
    for i, (r, term) in enumerate([(1.0, 0.0), (2.0, 1.0), (4.0, 0.0)]):
        tr = row(0.0, nr_envs=1)
        tr["reward"] = jnp.array([r])
        tr["terminated"] = jnp.array([term])
        tr["next_observation"] = jnp.full((1, 3), 10.0 + i)
        buffer = rb.add(buffer, tr)
    gamma = 0.5
    batch = rb.sample_nstep(buffer, jax.random.PRNGKey(1), 64, n_step=3, gamma=gamma, shard_local=False)
    # find samples starting at row 0
    mask0 = np.isclose(np.asarray(batch["n_step_reward"]), 1.0 + gamma * 2.0)
    assert mask0.any()  # sequence cut at termination: 1 + 0.5*2, NOT + 0.25*4
    idx = np.argmax(mask0)
    np.testing.assert_allclose(np.asarray(batch["n_step_next_observation"][idx]), 11.0)
    assert np.isclose(float(batch["n_step_gamma"][idx]), gamma**2)
    assert float(batch["n_step_terminated"][idx]) == 1.0
