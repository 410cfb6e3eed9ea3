"""Library-style config construction (no CLI needed).

The reference is CLI-only (absl flags built in `rl_x/runner/runner.py:179-181`);
this helper provides the same merged 3-namespace config for programmatic use:
tests, benchmarks, notebooks.
"""

import importlib

from ml_collections import config_dict

from rlx_tpu.algorithms.algorithm_manager import get_algorithm_config
from rlx_tpu.environments.environment_manager import get_environment_config
from rlx_tpu.runner.default_config import get_config as get_runner_config


def import_for(kind, dotted_name, implementation_package_names=("rlx_tpu",)):
    errors = []
    for pkg in implementation_package_names:
        try:
            importlib.import_module(f"{pkg}.{kind}.{dotted_name}")
            return
        except ModuleNotFoundError as e:
            errors.append(str(e))
    raise ValueError(f"Could not import {kind} '{dotted_name}': {errors}")


def make_config(algorithm_name, environment_name, implementation_package_names=("rlx_tpu",), **overrides):
    """Build the merged config; ``overrides`` use dotted keys, e.g.
    ``make_config("ppo.tpu", "classic.pendulum.tpu", **{"algorithm.nr_steps": 16})``.
    """
    from rlx_tpu.algorithms.algorithm_manager import registered_algorithm_names
    from rlx_tpu.environments.environment_manager import registered_environment_names

    # already-registered names (e.g. registered directly by tests or
    # embedding code) need no module import
    if algorithm_name not in registered_algorithm_names():
        import_for("algorithms", algorithm_name, implementation_package_names)
    if environment_name not in registered_environment_names():
        import_for("environments", environment_name, implementation_package_names)

    config = config_dict.ConfigDict()
    config.runner = get_runner_config()
    config.algorithm = get_algorithm_config(algorithm_name)
    config.environment = get_environment_config(environment_name)

    for dotted_key, value in overrides.items():
        node = config
        parts = dotted_key.split(".")
        for part in parts[:-1]:
            node = getattr(node, part)
        setattr(node, parts[-1], value)
    return config


def create_env(config):
    from rlx_tpu.environments.environment_manager import get_environment_create_env

    return get_environment_create_env(config.environment.name)(config)


def create_model(config, train_env=None, eval_env=None, run_path=None, writer=None):
    from rlx_tpu.algorithms.algorithm_manager import get_algorithm_model_class

    if train_env is None:
        train_env, eval_env = create_env(config)
    model_class = get_algorithm_model_class(config.algorithm.name)()
    return model_class(config, train_env, eval_env, run_path, writer)
