"""Soccer locomotion reward: the default locomotion shaping plus the
robocup-specific foot terms.

Mirrors the deltas of `robocup_soccer/locomotion/mjx/reward_functions/
default.py:208-243` over the robot_locomotion reward:

- feet_flat: penalize gravity tilt in each foot frame;
- feet_phase: Bezier-blended expected swing-foot height tracked against the
  gait oscillator phase (a POSITIVE reward joining the tracking group inside
  the clipped sum, `default.py:239`);
- feet_yaw: penalize foot yaw deviating from the trunk yaw.

Logical feet come from the robot's foot groups (heel+toe spheres share one
ankle body), so foot orientation/height use the group's first sphere.
"""

import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.locomotion.robot.tpu.rewards import DefaultReward


class SoccerReward(DefaultReward):
    def __init__(self, env, cfg):
        super().__init__(env, cfg)
        dt = env.dt
        self.feet_flat_coeff = cfg["feet_flat_coeff"] * dt
        self.feet_phase_coeff = cfg["feet_phase_coeff"] * dt
        self.feet_phase_swing_height = cfg["feet_phase_swing_height"]
        self.feet_phase_tracking_sigma = cfg["feet_phase_tracking_sigma"]
        self.feet_height_on_flat_ground = cfg["feet_height_on_flat_ground"]
        self.feet_yaw_coeff = cfg["feet_yaw_coeff"] * dt
        # group representative: first sphere of each logical foot (heel+toe
        # share the ankle body, so one rotation/height per foot)
        self.foot_reps = np.asarray([g[0] for g in env.foot_groups], dtype=np.int32)

    def extra_terms(self, internal, obsdata, action, info):
        env = self.env
        cc = internal["env_curriculum_coeff"]

        foot_rot = obsdata["feet_rotations"][:, self.foot_reps]       # [B, 2, 3, 3]
        foot_pos = obsdata["feet_positions"][:, self.foot_reps]       # [B, 2, 3]

        # feet flat: gravity expressed in the foot frame must stay vertical
        gravity_world = jnp.asarray([0.0, 0.0, -1.0])
        gravity_in_foot = jnp.einsum("bfji,j->bfi", foot_rot, gravity_world)
        feet_tilt = jnp.sqrt(jnp.sum(jnp.square(gravity_in_foot[..., :2]), axis=-1) + 1e-12)
        feet_flat = cc * self.feet_flat_coeff * -jnp.sum(feet_tilt, axis=1)

        # feet phase: Bezier-blended expected foot height over the gait cycle
        foot_z_rel = (foot_pos[..., 2] - env.foot_radius) - self.feet_height_on_flat_ground
        phase = env.gait_manager.phase_for_reward(internal)           # [B, 2]
        x = (phase + jnp.pi) / (2.0 * jnp.pi)
        s1 = 2.0 * x
        b1 = s1**3 + 3.0 * (s1**2 * (1.0 - s1))
        stance = self.feet_phase_swing_height * b1
        s2 = 2.0 * x - 1.0
        b2 = s2**3 + 3.0 * (s2**2 * (1.0 - s2))
        swing = self.feet_phase_swing_height * (1.0 - b2)
        expected_z = jnp.where(x <= 0.5, stance, swing)
        total_error = jnp.sum(jnp.square(foot_z_rel - expected_z), axis=1)
        feet_phase = cc * self.feet_phase_coeff * jnp.exp(
            -total_error / self.feet_phase_tracking_sigma
        )

        # feet yaw: foot heading tracks the trunk heading
        base_yaw = obsdata["imu_orientation_euler"][:, 2]
        foot_yaw = jnp.arctan2(foot_rot[..., 1, 0], foot_rot[..., 0, 0])
        yaw_err = (foot_yaw - base_yaw[:, None] + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
        feet_yaw = cc * self.feet_yaw_coeff * -jnp.mean(jnp.square(yaw_err), axis=1)

        info["reward/feet_flat"] = feet_flat
        info["reward/feet_phase"] = feet_phase
        info["reward/feet_yaw"] = feet_yaw
        return feet_phase, feet_flat + feet_yaw
