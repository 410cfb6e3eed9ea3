"""RoboCup soccer locomotion env (reference:
rl_x/environments/custom_mujoco/robocup_soccer/locomotion/mjx/)."""

from rlx_tpu.environments.environment_manager import extract_environment_name_from_file, register_environment
from rlx_tpu.environments.locomotion.soccer.tpu.create_env import create_train_and_eval_env
from rlx_tpu.environments.locomotion.soccer.tpu.default_config import get_config
from rlx_tpu.environments.locomotion.soccer.tpu.general_properties import GeneralProperties

SOCCER_LOCOMOTION_TPU = extract_environment_name_from_file(__file__)
register_environment(SOCCER_LOCOMOTION_TPU, get_config, create_train_and_eval_env, GeneralProperties)
