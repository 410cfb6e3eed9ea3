from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.c51.tpu.c51 import C51
from rlx_tpu.algorithms.c51.tpu.default_config import get_config
from rlx_tpu.algorithms.c51.tpu.general_properties import GeneralProperties

C51_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(C51_TPU, get_config, lambda: C51, GeneralProperties)
