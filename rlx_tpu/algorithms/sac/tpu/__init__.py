from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.algorithms.sac.tpu.default_config import get_config
from rlx_tpu.algorithms.sac.tpu.general_properties import GeneralProperties

SAC_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(SAC_TPU, get_config, lambda: SAC, GeneralProperties)
