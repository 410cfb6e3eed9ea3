from rlx_tpu.environments.types import (
    ActionSpaceType,
    DataInterfaceType,
    ObservationSpaceType,
    SimulationType,
)


class GeneralProperties:
    action_space_type = ActionSpaceType.CONTINUOUS
    observation_space_type = ObservationSpaceType.FLAT_VALUES
    data_interface_type = DataInterfaceType.JAX
    simulation_type = SimulationType.DEVICE
