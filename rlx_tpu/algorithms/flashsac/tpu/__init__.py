from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.flashsac.tpu.flashsac import FlashSAC
from rlx_tpu.algorithms.flashsac.tpu.default_config import get_config
from rlx_tpu.algorithms.flashsac.tpu.general_properties import GeneralProperties

NAME = extract_algorithm_name_from_file(__file__)
register_algorithm(NAME, get_config, lambda: FlashSAC, GeneralProperties)
