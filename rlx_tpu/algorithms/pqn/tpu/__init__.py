from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.pqn.tpu.pqn import PQN
from rlx_tpu.algorithms.pqn.tpu.default_config import get_config
from rlx_tpu.algorithms.pqn.tpu.general_properties import GeneralProperties

PQN_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(PQN_TPU, get_config, lambda: PQN, GeneralProperties)
