"""DMC host adapter: flat observations, episode bookkeeping, PPO smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("dm_control")


def test_dmc_cheetah_steps():
    from rlx_tpu.environments.dmc.host_bridge import DMCHostEnv

    env = DMCHostEnv("cheetah", "run", nr_envs=2, seed=0)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (2, env._obs_dim)
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros((2,) + env.single_action_space.shape))
    assert np.isfinite(np.asarray(state.observation)).all()
    assert (np.asarray(state.reward) >= 0).all()  # dmc rewards in [0, 1]
    env.close()
