from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.dqn.tpu.dqn import DQN
from rlx_tpu.algorithms.dqn.tpu.default_config import get_config
from rlx_tpu.algorithms.dqn.tpu.general_properties import GeneralProperties

DQN_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(DQN_TPU, get_config, lambda: DQN, GeneralProperties)
