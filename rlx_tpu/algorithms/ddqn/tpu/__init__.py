from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.ddqn.tpu.ddqn import DDQN
from rlx_tpu.algorithms.ddqn.tpu.default_config import get_config
from rlx_tpu.algorithms.ddqn.tpu.general_properties import GeneralProperties

DDQN_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(DDQN_TPU, get_config, lambda: DDQN, GeneralProperties)
