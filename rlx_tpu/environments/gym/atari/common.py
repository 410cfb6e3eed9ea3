"""Registration helper for ALE Atari host environments.

Mirrors the reference's per-game directory layout
(`rl_x/environments/gym/atari/pong_v5/create_env.py:1-51`) with the shared
TPU host bridge: each game registers a HostGymEnv built from the wrapped
Atari stack (``wrappers.wrap_atari``), emitting [84, 84, 4] uint8
observations through the io_callback bridge.

ale_py is not installed in this image, so env CREATION is gated: config and
registration always work (show_config, compat checks), and
``create_train_and_eval_env`` raises a clear ImportError if ALE is missing.
The wrapper stack itself is unit-tested with a fake ALE
(tests/test_atari_wrappers.py).
"""

from ml_collections import config_dict

from rlx_tpu.environments.gym.host_bridge import HostGymEnv
from rlx_tpu.environments.types import (
    ActionSpaceType,
    DataInterfaceType,
    ObservationSpaceType,
    SimulationType,
)


def make_atari_registration(game_type, nr_envs=8):
    def get_config(environment_name):
        config = config_dict.ConfigDict()
        config.name = environment_name
        config.type = game_type  # ALE suffix, e.g. "Pong-v5"
        config.seed = 1
        config.nr_envs = nr_envs
        config.async_workers = 0
        config.async_skip_percentage = 0.0
        config.noop_max = 30
        config.frame_skip = 4
        config.frame_stack = 4
        config.screen_size = 84
        config.episodic_life = True
        config.clip_reward = True
        config.render = False
        return config

    def _make_env_fn(cfg, render):
        def thunk():
            import gymnasium as gym

            try:
                import ale_py

                gym.register_envs(ale_py)
            except ImportError as e:
                raise ImportError(
                    "Atari environments need ale_py, which is not installed "
                    "in this image. The wrapper stack is ready; install "
                    "ale_py to enable ALE games."
                ) from e

            from rlx_tpu.environments.gym.atari.wrappers import wrap_atari

            env = gym.make(f"ALE/{cfg.type}",
                           render_mode="human" if render else None)
            return wrap_atari(
                env,
                noop_max=cfg.noop_max,
                skip=cfg.frame_skip,
                screen_size=cfg.screen_size,
                nr_frames=cfg.frame_stack,
                clip_reward=cfg.clip_reward,
                episodic_life=cfg.episodic_life,
            )
        return thunk

    def create_train_and_eval_env(config):
        cfg = config.environment
        train_env = HostGymEnv(
            f"ALE/{cfg.type}", cfg.nr_envs, seed=cfg.seed,
            env_fns=[_make_env_fn(cfg, cfg.render)] * cfg.nr_envs,
            async_workers=cfg.async_workers,
            async_skip_percentage=cfg.async_skip_percentage,
        )
        eval_env = HostGymEnv(
            f"ALE/{cfg.type}", cfg.nr_envs, seed=cfg.seed + 10_000,
            env_fns=[_make_env_fn(cfg, False)] * cfg.nr_envs,
        )
        for env in (train_env, eval_env):
            env.general_properties = general_properties
            env.horizon = 108_000 // max(cfg.frame_skip, 1)  # ALE cap
        return train_env, eval_env

    class general_properties:  # noqa: N801 - instance-like class record
        action_space_type = ActionSpaceType.DISCRETE
        observation_space_type = ObservationSpaceType.IMAGES
        data_interface_type = DataInterfaceType.JAX
        simulation_type = SimulationType.HOST

    return get_config, create_train_and_eval_env, general_properties
