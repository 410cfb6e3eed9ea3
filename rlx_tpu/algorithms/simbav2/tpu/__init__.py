from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.simbav2.tpu.simbav2 import SimbaV2
from rlx_tpu.algorithms.simbav2.tpu.default_config import get_config
from rlx_tpu.algorithms.simbav2.tpu.general_properties import GeneralProperties

NAME = extract_algorithm_name_from_file(__file__)
register_algorithm(NAME, get_config, lambda: SimbaV2, GeneralProperties)
