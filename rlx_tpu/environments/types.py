"""Compatibility typing enums for algorithm/environment matching.

Mirrors the capability-typing contract of the reference
(`rl_x/environments/action_space_type.py`, `observation_space_type.py`,
`data_interface_type.py`, `simulation_type.py`,
`rl_x/algorithms/deep_learning_framework_type.py`) in a single module.
The runner cross-checks these at startup (`rl_x/runner/runner.py:83-91`).
"""

from enum import Enum


class ActionSpaceType(Enum):
    CONTINUOUS = 0
    DISCRETE = 1


class ObservationSpaceType(Enum):
    FLAT_VALUES = 0
    IMAGES = 1


class DataInterfaceType(Enum):
    """How observations/actions cross the algorithm<->environment boundary.

    JAX    — pure device arrays; env is stepped inside the jitted program.
    NUMPY  — host arrays; env is stepped on host (Gymnasium adapter).
    LIST   — plain python lists (socket custom-interface).
    """

    JAX = 0
    NUMPY = 1
    LIST = 2


class SimulationType(Enum):
    """Where the simulation runs.

    DEVICE — pure-JAX env, lives inside the XLA program (TPU-resident).
    HOST   — stepped on the host CPU, bridged via callbacks.
    """

    DEVICE = 0
    HOST = 1


class DeepLearningFrameworkType(Enum):
    JAX = 0
