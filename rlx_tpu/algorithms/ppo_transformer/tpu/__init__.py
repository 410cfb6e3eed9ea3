from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.ppo_transformer.tpu.ppo_transformer import PPOTransformer
from rlx_tpu.algorithms.ppo_transformer.tpu.default_config import get_config
from rlx_tpu.algorithms.ppo_transformer.tpu.general_properties import GeneralProperties

NAME = extract_algorithm_name_from_file(__file__)
register_algorithm(NAME, get_config, lambda: PPOTransformer, GeneralProperties)
