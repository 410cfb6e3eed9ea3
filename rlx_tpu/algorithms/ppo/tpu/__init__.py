from rlx_tpu.algorithms.algorithm_manager import extract_algorithm_name_from_file, register_algorithm
from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
from rlx_tpu.algorithms.ppo.tpu.default_config import get_config
from rlx_tpu.algorithms.ppo.tpu.general_properties import GeneralProperties

PPO_TPU = extract_algorithm_name_from_file(__file__)
register_algorithm(PPO_TPU, get_config, lambda: PPO, GeneralProperties)
