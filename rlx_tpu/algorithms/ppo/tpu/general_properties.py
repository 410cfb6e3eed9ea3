from rlx_tpu.environments.types import (
    ActionSpaceType,
    DataInterfaceType,
    DeepLearningFrameworkType,
    ObservationSpaceType,
)


class GeneralProperties:
    observation_space_types = [ObservationSpaceType.FLAT_VALUES, ObservationSpaceType.IMAGES]
    action_space_types = [ActionSpaceType.CONTINUOUS, ActionSpaceType.DISCRETE]
    data_interface_types = [DataInterfaceType.JAX]

    deep_learning_framework_type = DeepLearningFrameworkType.JAX
