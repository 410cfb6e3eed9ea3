"""PlaygroundAdapter: brax-style State protocol -> rlx_tpu device-env
contract, stub-tested (mujoco_playground absent in this image).

Mirrors the reference's wrapper semantics
(`mujoco_playground/g1_joystick_flat_terrain/mjx/wrappers.py:26-79`):
asymmetric obs indices from the obs dict, truncation split out of done,
episode statistics latched at done."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from rlx_tpu.environments.playground.adapter import PlaygroundAdapter


@struct.dataclass
class FakeBraxState:
    obs: dict
    reward: jnp.ndarray
    done: jnp.ndarray
    metrics: dict
    info: dict
    t: jnp.ndarray


class FakeBraxEnv:
    """brax-training-style stub: vector dynamics, episode of 5 steps with
    truncation, auto-reset on done, obs dict with a privileged suffix."""

    action_size = 2
    observation_size = {"state": (4,), "privileged_state": (6,)}
    episode_length = 5

    def _obs(self, t, B):
        base = jnp.tile(t[:, None], (1, 4))
        privileged = jnp.concatenate([base, jnp.full((B, 2), 9.0)], axis=1)
        return {"state": base, "privileged_state": privileged}

    def reset(self, key):
        B = 3
        t = jnp.zeros(B)
        return FakeBraxState(
            obs=self._obs(t, B), reward=jnp.zeros(B), done=jnp.zeros(B),
            metrics={"speed": jnp.zeros(B)}, info={"truncation": jnp.zeros(B)}, t=t,
        )

    def step(self, state, action):
        B = state.t.shape[0]
        t = state.t + 1
        done = t >= self.episode_length
        truncation = done  # this stub only ever truncates
        t = jnp.where(done, 0.0, t)  # auto-reset
        return FakeBraxState(
            obs=self._obs(t, B),
            reward=jnp.sum(jnp.abs(action), axis=-1),
            done=done.astype(jnp.float32),
            metrics={"speed": t},
            info={"truncation": truncation.astype(jnp.float32)},
            t=t,
        )


@pytest.fixture()
def env():
    return PlaygroundAdapter(FakeBraxEnv(), nr_envs=3, horizon=5)


def test_adapter_contract(env):
    # policy indices are the prefix of the privileged vector
    assert env.single_observation_space.shape == (6,)
    np.testing.assert_array_equal(np.asarray(env.policy_observation_indices), np.arange(4))
    np.testing.assert_array_equal(np.asarray(env.critic_observation_indices), np.arange(6))

    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (3, 6)
    assert float(state.info["env_info/speed"].sum()) == 0.0


def test_adapter_episode_statistics_and_truncation(env):
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    action = jnp.ones((3, 2))
    for t in range(5):
        state = step(state, action)
    # episode ended by truncation, not termination
    assert bool(state.truncated.all()) and not bool(state.terminated.any())
    # reward 2.0/step x 5 steps latched at done
    np.testing.assert_allclose(np.asarray(state.info["rollout/episode_return"]), 10.0)
    np.testing.assert_allclose(np.asarray(state.info["rollout/episode_length"]), 5.0)
    # store reset for the next episode
    np.testing.assert_allclose(np.asarray(state.episode_store["episode_return"]), 0.0)


def test_adapter_trains_with_ppo(env):
    from rlx_tpu.config import create_model, make_config
    from rlx_tpu.environments import environment_manager as em
    from rlx_tpu.environments.playground.adapter import GeneralProperties

    def fake_config(name):
        from ml_collections import config_dict

        c = config_dict.ConfigDict()
        c.name = name
        c.seed = 1
        c.nr_envs = 3
        return c

    def fake_create(config):
        e = PlaygroundAdapter(FakeBraxEnv(), nr_envs=3, horizon=5)
        return e, e

    em.register_environment("test.fake_playground.tpu", fake_config, fake_create, GeneralProperties)
    config = make_config(
        "ppo.tpu", "test.fake_playground.tpu",
        **{
            "algorithm.total_timesteps": 2 * 3 * 5,
            "algorithm.nr_steps": 5,
            "algorithm.minibatch_size": 5,
            "algorithm.nr_epochs": 1,
            "environment.nr_envs": 3,
            "runner.mesh_dp": 1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_registration_gated_on_package():
    import rlx_tpu.environments.playground.g1_joystick_flat_terrain.tpu as pg

    config = pg.get_config("playground.g1_joystick_flat_terrain.tpu")
    assert config.type == "G1JoystickFlatTerrain"
    try:
        import mujoco_playground  # noqa: F401

        has_pkg = True
    except ImportError:
        has_pkg = False
    if not has_pkg:
        from ml_collections import config_dict

        with pytest.raises(ImportError, match="mujoco_playground"):
            pg.create_train_and_eval_env(config_dict.ConfigDict({"environment": config}))
