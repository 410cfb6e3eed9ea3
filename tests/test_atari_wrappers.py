"""Atari wrapper stack semantics, unit-tested against a fake ALE env
(ale_py itself is not installed in this image).

Mirrors the reference's wrapper behavior
(`rl_x/environments/gym/atari/pong_v5/wrappers.py:66-171`) and checks the
TPU-first deltas: channels-last [84, 84, 4] uint8 output, and raw episode
statistics surviving reward clipping / episodic-life splits.
"""

import gymnasium as gym
import numpy as np
import pytest

from rlx_tpu.environments.gym.atari.wrappers import (
    ChannelsLastFrameStack,
    ClipRewardEnv,
    EpisodeStatistics,
    EpisodicLifeEnv,
    FireResetEnv,
    MaxAndSkipEnv,
    NoopResetEnv,
    wrap_atari,
)


class _FakeALE:
    def __init__(self, env):
        self._env = env

    def lives(self):
        return self._env._lives


class FakeAtariEnv(gym.Env):
    """Deterministic ALE stand-in: 210x160x3 uint8 frames whose pixel value
    equals the step counter; 3 lives, one lost every 5 steps; reward +2 on
    even steps, -3 on steps divisible by 7; episode ends when lives hit 0.
    """

    metadata = {"render_modes": []}

    def __init__(self):
        self.observation_space = gym.spaces.Box(0, 255, (210, 160, 3), np.uint8)
        self.action_space = gym.spaces.Discrete(6)
        self.ale = _FakeALE(self)
        self._t = 0
        self._lives = 3
        self.steps_taken = []  # actions seen since construction

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "UP", "RIGHT", "LEFT", "DOWN"]

    def _frame(self):
        return np.full((210, 160, 3), min(self._t, 255), np.uint8)

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        self._t = 0
        self._lives = 3
        return self._frame(), {}

    def step(self, action):
        self.steps_taken.append(int(action))
        self._t += 1
        reward = 0.0
        if self._t % 2 == 0:
            reward = 2.0
        if self._t % 7 == 0:
            reward = -3.0
        if self._t % 5 == 0:
            self._lives -= 1
        terminated = self._lives <= 0
        return self._frame(), reward, terminated, False, {}


def test_noop_reset_randomizes_start():
    env = NoopResetEnv(FakeAtariEnv(), noop_max=10)
    seen = set()
    for seed in range(5):
        env.reset(seed=seed)
        noops = [a for a in env.unwrapped.steps_taken if a == 0]
        assert 1 <= len(noops) <= 10
        seen.add(len(noops))
        env.unwrapped.steps_taken.clear()
    assert len(seen) > 1, "noop count should vary across seeds"


def test_fire_reset_presses_fire():
    env = FireResetEnv(FakeAtariEnv())
    env.reset(seed=0)
    assert env.unwrapped.steps_taken[:2] == [1, 2]


def test_episodic_life_terminates_per_life_but_resets_on_game_over():
    env = EpisodicLifeEnv(FakeAtariEnv())
    env.reset(seed=0)
    terms = []
    first_reset_t = None
    for _ in range(15):
        _, _, terminated, truncated, _ = env.step(2)
        terms.append(terminated)
        if terminated or truncated:
            env.reset()
            if first_reset_t is None:
                first_reset_t = env.unwrapped._t
    # life losses at raw steps 5/10/15 -> three per-life terminations
    assert sum(terms) == 3
    # the first per-life reset must NOT restart the game: it NOOP-steps past
    # the life-loss frame (t=5 -> 6) instead of zeroing the clock
    assert first_reset_t == 6


def test_max_and_skip_sums_rewards_and_maxes_frames():
    raw = FakeAtariEnv()
    env = MaxAndSkipEnv(raw, skip=4)
    raw.reset(seed=0)
    obs, reward, *_ = env.step(2)
    # steps 1..4: rewards 0, 2, 0, 2 -> 4.0
    assert reward == 4.0
    # max of frames at t=3 (value 3) and t=4 (value 4) -> 4
    assert obs.max() == 4 and obs.min() == 4


def test_clip_reward_sign():
    env = ClipRewardEnv(FakeAtariEnv())
    env.reset(seed=0)
    rewards = [env.step(0)[1] for _ in range(7)]
    assert set(rewards) <= {-1.0, 0.0, 1.0}
    assert rewards[6] == -1.0  # raw -3 at t=7


def test_channels_last_frame_stack():
    env = FakeAtariEnv()
    env = gym.wrappers.ResizeObservation(env, (84, 84))
    env = gym.wrappers.GrayscaleObservation(env)
    env = ChannelsLastFrameStack(env, nr_frames=4)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (84, 84, 4) and obs.dtype == np.uint8
    assert (obs[..., 0] == obs[..., 3]).all(), "reset replicates the first frame"
    obs, *_ = env.step(0)
    # newest frame (t=1, pixel 1) lands in the LAST channel
    assert obs[..., 3].max() == 1 and obs[..., 0].max() == 0


def test_wrap_atari_full_stack_and_episode_stats():
    env = wrap_atari(FakeAtariEnv(), noop_max=2, skip=4, nr_frames=4)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (84, 84, 4) and obs.dtype == np.uint8
    info = {}
    for _ in range(20):
        obs, reward, terminated, truncated, info = env.step(3)
        assert reward in (-1.0, 0.0, 1.0)
        if terminated or truncated:
            if "episode_return" in info:
                break
            obs, _ = env.reset()
    assert "episode_return" in info, "raw episode stats must surface on real game over"
    # raw (unclipped) return over steps 1..15: +2 at t=2,4,6,8,10,12 and
    # -3 at t=7,14 (the t%7 rule overrides t=14's +2) -> 6.0
    assert info["episode_return"] == 6.0
    assert info["episode_length"] == 15


def test_host_bridge_runs_ppo_on_fake_atari():
    """End-to-end: the wrapped fake-ALE stack bridges into the fused PPO
    program via HostGymEnv (uint8 images through io_callback)."""
    import jax
    import numpy as _np

    from rlx_tpu.config import create_model, make_config
    from rlx_tpu.environments.gym.host_bridge import HostGymEnv
    from rlx_tpu.environments.types import (
        ActionSpaceType, DataInterfaceType, ObservationSpaceType, SimulationType,
    )

    class props:
        action_space_type = ActionSpaceType.DISCRETE
        observation_space_type = ObservationSpaceType.IMAGES
        data_interface_type = DataInterfaceType.JAX
        simulation_type = SimulationType.HOST

    def fake_create(config):
        fns = [lambda: wrap_atari(FakeAtariEnv(), noop_max=2)] * config.environment.nr_envs
        train_env = HostGymEnv("fake", config.environment.nr_envs, env_fns=fns)
        eval_env = HostGymEnv("fake", config.environment.nr_envs, env_fns=fns)
        for e in (train_env, eval_env):
            e.general_properties = props
            e.horizon = 32
        return train_env, eval_env

    def _fake_config(name):
        from ml_collections import config_dict

        c = config_dict.ConfigDict()
        c.name = name
        c.seed = 1
        c.nr_envs = 2
        return c

    from rlx_tpu.environments import environment_manager as em

    em.register_environment("test.fake_atari.host", _fake_config, fake_create, props)

    config = make_config(
        "ppo.tpu",
        "test.fake_atari.host",
        **{
            "algorithm.total_timesteps": 2 * 2 * 8,
            "algorithm.nr_steps": 8,
            "algorithm.minibatch_size": 8,
            "algorithm.nr_epochs": 1,
            "environment.nr_envs": 2,
            "runner.mesh_dp": 1,
        },
    )
    model = create_model(config)
    assert model.train_env.single_observation_space.shape == (84, 84, 4)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert _np.isfinite(_np.asarray(leaf)).all()


def test_pong_registration_gated_on_ale():
    """Registration itself works; creation raises a clear error sans ale_py."""
    import rlx_tpu.environments.gym.atari.pong_v5.host as pong

    config = pong.get_config("gym.atari.pong_v5.host")
    assert config.type == "Pong-v5" and config.frame_stack == 4
    has_ale = True
    try:
        import ale_py  # noqa: F401
    except ImportError:
        has_ale = False
    if not has_ale:
        from ml_collections import config_dict

        full = config_dict.ConfigDict({"environment": config})
        with pytest.raises(ImportError, match="ale_py"):
            pong.create_train_and_eval_env(full)
