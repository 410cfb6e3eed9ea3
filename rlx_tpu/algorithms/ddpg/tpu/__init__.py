from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.ddpg.tpu.ddpg import DDPG
from rlx_tpu.algorithms.ddpg.tpu.default_config import get_config
from rlx_tpu.algorithms.ddpg.tpu.general_properties import GeneralProperties

DDPG_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(DDPG_TPU, get_config, lambda: DDPG, GeneralProperties)
