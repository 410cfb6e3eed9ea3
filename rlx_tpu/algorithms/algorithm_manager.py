"""Algorithm registry.

Same contract as the reference (`rl_x/algorithms/algorithm_manager.py:5-25`):
module-level dict, dotted names from directory structure, leaf ``__init__.py``
self-registration, and a 4-field record instead of a base class.
"""

import os

_algorithms = {}


def extract_algorithm_name_from_file(file_path, package_marker="algorithms"):
    """`.../rlx_tpu/algorithms/ppo/tpu/__init__.py` -> `ppo.tpu`."""
    parts = os.path.normpath(os.path.dirname(file_path)).split(os.sep)
    idx = len(parts) - 1 - parts[::-1].index(package_marker)
    return ".".join(parts[idx + 1:])


class Algorithm:
    def __init__(self, name, get_default_config, get_model_class, general_properties):
        self.name = name
        self.get_default_config = get_default_config
        self.get_model_class = get_model_class
        self.general_properties = general_properties


def register_algorithm(name, get_default_config, get_model_class, general_properties):
    _algorithms[name] = Algorithm(name, get_default_config, get_model_class, general_properties)


def get_algorithm_config(algorithm_name):
    return _algorithms[algorithm_name].get_default_config(algorithm_name)


def get_algorithm_model_class(algorithm_name):
    return _algorithms[algorithm_name].get_model_class


def get_algorithm_general_properties(algorithm_name):
    return _algorithms[algorithm_name].general_properties


def registered_algorithm_names():
    return sorted(_algorithms)
