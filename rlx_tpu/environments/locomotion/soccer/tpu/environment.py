"""RoboCup soccer locomotion environment.

The reference describes this family as the robot_locomotion environment plus
four deltas (`robocup_soccer/README.md:12-24`): a sinusoidal gait-phase
manager (observations + reward term), soccer-competition DR/noise/
perturbation ranges, a FIXED 1-control-step action delay matching
RCSSServerMJ's 20 ms, and the Booster T1 robot.  Here those deltas ride the
shared batched-native LocomotionEnv through its variant hooks instead of
duplicating the 600-line environment:

- gait oscillator state lives in the internal dict ([B, 2] phases), advanced
  once per control step and resampled (phase offset + frequency) per episode
  under the curriculum;
- 4 phase features (sin/cos of both foot phases) are appended to BOTH the
  policy and critic observation index sets
  (`robocup .../environment.py:544-574`);
- the soccer reward adds feet_flat / feet_phase / feet_yaw
  (rewards.SoccerReward);
- the fixed delay falls out of the existing action-delay machinery with
  min_delay_s == max_delay_s (default_config.py).
"""

from rlx_tpu.environments.locomotion.robot.tpu.environment import LocomotionEnv
from rlx_tpu.environments.locomotion.robot.tpu.rewards import REWARD_FUNCTIONS
from rlx_tpu.environments.locomotion.soccer.tpu.gait import GaitManager
from rlx_tpu.environments.locomotion.soccer.tpu.rewards import SoccerReward

REWARD_FUNCTIONS.setdefault("soccer", SoccerReward)


class SoccerEnv(LocomotionEnv):
    def __init__(self, env_config, nr_envs):
        # the gait manager must exist before the base constructor builds the
        # observation layout (nr_extra_observations) — only env.dt is read
        # lazily, so a two-phase init is safe
        self.gait_manager = None
        super().__init__(env_config, nr_envs)
        self.gait_manager = GaitManager(self, env_config["gait_manager"])

    # --- variant hooks ---------------------------------------------------
    def nr_extra_observations(self):
        return 4  # sin/cos of two foot phases

    def extra_observation(self, internal):
        return self.gait_manager.phase_features(internal)

    def extra_internal_init(self, nr_envs):
        # GaitManager is constructed after the base init, but reset() always
        # runs afterwards, so self.gait_manager is live here
        return self.gait_manager.init_state(nr_envs)

    def extra_episode_start(self, internal, mask, key, eval_mode):
        return self.gait_manager.episode_start(internal, mask, key, eval_mode)

    def internal_step_update(self, internal):
        return self.gait_manager.step(internal)

    def reward_function_info_keys(self):
        return super().reward_function_info_keys() + [
            "reward/feet_flat", "reward/feet_phase", "reward/feet_yaw",
        ]
