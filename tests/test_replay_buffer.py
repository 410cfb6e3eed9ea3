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
    buffer = buffer.replace(data=data, size=jnp.asarray(4, jnp.int32))
    batch = rb.sample(buffer, jax.random.PRNGKey(0), 16, shard_local=True, dp_size=4)
    env_ids = np.asarray(batch["observation"][:, 0])
    # index i reads shard i % 4 => env in [2*(i%4), 2*(i%4)+1]
    for i, e in enumerate(env_ids):
        shard = i % 4
        assert 2 * shard <= e <= 2 * shard + 1


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
