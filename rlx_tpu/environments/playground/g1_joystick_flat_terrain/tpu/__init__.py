"""mujoco_playground G1JoystickFlatTerrain via the PlaygroundAdapter
(reference: rl_x/environments/mujoco_playground/g1_joystick_flat_terrain/mjx/).

The mujoco_playground package is not installed in this image; registration
and config always work, env CREATION raises a clear ImportError until the
dependency exists (the adapter itself is stub-tested in
tests/test_playground_adapter.py).
"""

from ml_collections import config_dict

from rlx_tpu.environments.environment_manager import extract_environment_name_from_file, register_environment
from rlx_tpu.environments.playground.adapter import GeneralProperties, PlaygroundAdapter


def get_config(environment_name):
    config = config_dict.ConfigDict()
    config.name = environment_name
    config.type = "G1JoystickFlatTerrain"
    config.seed = 1
    config.nr_envs = 4096
    config.use_domain_randomization = False
    config.render = False
    config.copy_train_env_for_eval = True
    return config


def create_train_and_eval_env(config):
    try:
        from mujoco_playground import registry, wrapper
    except ImportError as e:
        raise ImportError(
            "mujoco_playground is not installed in this image; the adapter "
            "(rlx_tpu/environments/playground/adapter.py) is ready — install "
            "the package to enable this env."
        ) from e

    cfg = config.environment
    mbp_config = registry.get_default_config(cfg.type)
    randomizer = (registry.get_domain_randomizer(cfg.type)
                  if cfg.use_domain_randomization else None)

    def build():
        env = registry.load(cfg.type, config=mbp_config)
        env = wrapper.wrap_for_brax_training(
            env, episode_length=mbp_config.episode_length,
            action_repeat=mbp_config.action_repeat, randomization_fn=randomizer,
        )
        mj_model = env.unwrapped.mj_model
        return PlaygroundAdapter(
            env, cfg.nr_envs, horizon=mbp_config.episode_length,
            action_center=env.unwrapped._default_pose,
            action_scale=mbp_config.action_scale,
        )

    train_env = build()
    if cfg.copy_train_env_for_eval:
        return train_env, train_env
    return train_env, build()


NAME = extract_environment_name_from_file(__file__)
register_environment(NAME, get_config, create_train_and_eval_env, GeneralProperties)
