from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.reppo.tpu.reppo import REPPO
from rlx_tpu.algorithms.reppo.tpu.default_config import get_config
from rlx_tpu.algorithms.reppo.tpu.general_properties import GeneralProperties

NAME = extract_algorithm_name_from_file(__file__)
register_algorithm(NAME, get_config, lambda: REPPO, GeneralProperties)
