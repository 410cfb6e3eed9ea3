from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.td3.tpu.td3 import TD3
from rlx_tpu.algorithms.td3.tpu.default_config import get_config
from rlx_tpu.algorithms.td3.tpu.general_properties import GeneralProperties

TD3_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(TD3_TPU, get_config, lambda: TD3, GeneralProperties)
