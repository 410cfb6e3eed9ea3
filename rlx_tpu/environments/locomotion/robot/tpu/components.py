"""Command / sampling / termination / exteroception function registries.

Batched re-cut of the reference's pluggable component directories
(`rl_x/environments/custom_mujoco/robot_locomotion/mjx/{command_functions,
sampling_functions,termination_functions,exteroceptive_observation_functions}`).
Each component is a tiny class closing over static config; per-env state
lives in the env's ``internal`` dict of ``[B, ...]`` arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np


# --- sampling schedules (sampling_functions/*.py) --------------------------

class NoneSampling:
    def __init__(self, env, probability=0.002):
        pass

    def setup(self, key, B, curriculum_coeff=1.0):
        return jnp.zeros(B, bool)

    def step(self, key, B, curriculum_coeff=1.0):
        return jnp.zeros(B, bool)


class EveryStepSampling(NoneSampling):
    def setup(self, key, B, curriculum_coeff=1.0):
        return jnp.ones(B, bool)

    def step(self, key, B, curriculum_coeff=1.0):
        return jnp.ones(B, bool)


class StepProbabilitySampling:
    def __init__(self, env, probability=0.002):
        self.probability = probability

    def setup(self, key, B, curriculum_coeff=1.0):
        return jnp.zeros(B, bool)

    def step(self, key, B, curriculum_coeff=1.0):
        return jax.random.uniform(key, (B,)) < self.probability * curriculum_coeff


class StepProbabilityAndResetSampling(StepProbabilitySampling):
    def setup(self, key, B, curriculum_coeff=1.0):
        return jnp.ones(B, bool)


SAMPLING_FUNCTIONS = {
    "none": NoneSampling,
    "every_step": EveryStepSampling,
    "step_probability": StepProbabilitySampling,
    "step_probability_and_reset": StepProbabilityAndResetSampling,
}


def get_sampling_function(name, env):
    return SAMPLING_FUNCTIONS[name](env)


# --- commands (command_functions/random.py) ---------------------------------

class RandomCommands:
    """Uniform (vx, vy, vyaw) commands with zero-clipping and zeroing chances."""

    def __init__(self, env, cfg):
        self.env = env
        self.max_velocity_per_m_factor = cfg["max_velocity_per_m_factor"]
        self.clip_max_velocity = cfg["clip_max_velocity"]
        self.zero_clip_threshold_percentage = cfg["zero_clip_threshold_percentage"]
        self.all_zero_chance = cfg["all_zero_chance"]
        self.single_zero_chance = cfg["single_zero_chance"]

        keep = np.zeros(env.nr_actuator_joints, dtype=np.float32)
        keep[np.asarray(env.robot_config["actuator_joints_to_stay_near_nominal"], int)] = 1.0
        self.default_keep_nominal = jnp.asarray(keep)

    def max_command_velocity(self):
        return min(
            self.env.robot_dimensions_mean * self.max_velocity_per_m_factor,
            self.clip_max_velocity,
        )

    def init_state(self, nr_envs):
        return {
            "goal_velocities": jnp.zeros((nr_envs, 3)),
            "actuator_joint_keep_nominal": jnp.tile(self.default_keep_nominal, (nr_envs, 1)),
        }

    def get_next_command(self, internal, should_sample, key):
        """should_sample [B] -> updated goal_velocities / keep-nominal masks."""
        B = should_sample.shape[0]
        vel_key, all_zero_key, single_zero_key = jax.random.split(key, 3)
        max_v = internal["max_command_velocity"][:, None]                  # [B, 1]

        goals = jax.random.uniform(vel_key, (B, 3), minval=-1.0, maxval=1.0) * max_v
        goals = jnp.where(jnp.abs(goals) < self.zero_clip_threshold_percentage * max_v, 0.0, goals)
        all_zero = jax.random.bernoulli(all_zero_key, self.all_zero_chance, (B,))
        goals = jnp.where(all_zero[:, None], 0.0, goals)
        goals = jnp.where(
            jax.random.uniform(single_zero_key, (B, 3)) < self.single_zero_chance, 0.0, goals
        )

        standing = jnp.all(goals == 0.0, axis=1)
        keep = jnp.where(
            standing[:, None],
            jnp.ones((B, self.default_keep_nominal.shape[0])),
            self.default_keep_nominal[None],
        )

        internal = dict(internal)
        internal["goal_velocities"] = jnp.where(
            should_sample[:, None], goals, internal["goal_velocities"]
        )
        internal["actuator_joint_keep_nominal"] = jnp.where(
            should_sample[:, None], keep, internal["actuator_joint_keep_nominal"]
        )
        return internal


COMMAND_FUNCTIONS = {"random": RandomCommands}


def get_command_function(name, env, cfg):
    return COMMAND_FUNCTIONS[name](env, cfg)


# --- termination (termination_functions/below_height.py) --------------------

class BelowHeightTermination:
    def __init__(self, env, cfg):
        self.env = env
        self.height_percentage_threshold = cfg["height_percentage_threshold"]

    def should_terminate(self, internal):
        threshold = (
            (1.0 - internal["env_curriculum_coeff"])
            * self.height_percentage_threshold
            * self.env.nominal_imu_height_over_ground
        )
        return internal["imu_height_over_ground"] < threshold


TERMINATION_FUNCTIONS = {"below_height": BelowHeightTermination}


def get_termination_function(name, env, cfg):
    return TERMINATION_FUNCTIONS[name](env, cfg)


# --- exteroceptive observations ---------------------------------------------

class NoneExteroception:
    nr_exteroceptive_observations = 0

    def __init__(self, env, cfg=None):
        self.env = env

    def get(self, internal, trunk_pos, trunk_yaw):
        B = trunk_pos.shape[0]
        return jnp.zeros((B, 0))


class HeightOverGroundExteroception(NoneExteroception):
    nr_exteroceptive_observations = 1

    def get(self, internal, trunk_pos, trunk_yaw):
        return internal["imu_height_over_ground"][:, None]


class HeightSamplesExteroception(NoneExteroception):
    """Grid of terrain heights relative to the robot, rotated with its yaw
    (`exteroceptive_observation_functions/height_samples.py` equivalent)."""

    def __init__(self, env, cfg=None):
        self.env = env
        self.grid = np.asarray(
            [[x, y] for x in np.linspace(-0.5, 0.5, 5) for y in np.linspace(-0.35, 0.35, 5)],
            dtype=np.float32,
        )  # [25, 2] body-frame sample points
        self.nr_exteroceptive_observations = len(self.grid)

    def get(self, internal, trunk_pos, trunk_yaw):
        c, s = jnp.cos(trunk_yaw), jnp.sin(trunk_yaw)            # [B]
        gx = self.grid[None, :, 0]                                # [1, 25]
        gy = self.grid[None, :, 1]
        wx = trunk_pos[:, 0:1] + c[:, None] * gx - s[:, None] * gy
        wy = trunk_pos[:, 1:2] + s[:, None] * gx + c[:, None] * gy
        ground = self.env.terrain_function.height_at(internal, wx, wy)  # [B, 25]
        return trunk_pos[:, 2:3] - ground


EXTEROCEPTION_FUNCTIONS = {
    "none": NoneExteroception,
    "height_over_ground": HeightOverGroundExteroception,
    "height_samples": HeightSamplesExteroception,
}


def get_exteroceptive_observation_function(name, env):
    return EXTEROCEPTION_FUNCTIONS[name](env)


# --- control (control_functions/pd.py) ---------------------------------------

class PDControl:
    """Action -> target joint positions for the engine's position servos."""

    def __init__(self, env, control_frequency_hz=50):
        self.env = env
        self.control_frequency_hz = control_frequency_hz

    def process_action(self, action, internal):
        scaled = action * internal["scaling_factor"][:, None]
        target = internal["actuator_joint_nominal_positions"] + scaled
        return target + internal["position_offsets"]


CONTROL_FUNCTIONS = {"pd": PDControl}


def get_control_function(name, env):
    return CONTROL_FUNCTIONS[name](env)
