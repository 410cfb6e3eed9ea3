"""Ant velocity-tracking locomotion on the pure-JAX physics engine.

Task parity with the reference MJX Ant
(`rl_x/environments/custom_mujoco/ant/mjx/environment.py:15-207`):
- 34-dim observation: height, joint positions (relative to nominal), joint
  velocities, local linear/angular velocities, projected gravity, last ctrl;
- reward: xy velocity-command tracking  exp(-||v_cmd - v_local_xy||^2 / 0.25)
  with command (2.0, 0.0) m/s;
- termination: torso height outside (0.2, 1.0); 4 physics substeps per
  control step; actions are target joint offsets scaled by
  ``action_scaling_factor`` around the nominal pose.

TPU-native difference: the batch is stepped as ``[B, ...]`` arrays through
``rlx_tpu.physics`` (no vmap of per-env MJX data structs), so the env-batch
axis shards directly over the mesh dp axis.
"""

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlx_tpu.environments.env import DeviceEnv
from rlx_tpu.environments.spaces import BoxSpace
from rlx_tpu.physics import engine, load_mjcf
from rlx_tpu.physics.spatial import quat_to_rot

ANT_XML = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "ant.xml")


class AntPhysics(NamedTuple):
    qpos: jax.Array
    qvel: jax.Array
    ctrl: jax.Array


class Ant(DeviceEnv):
    def __init__(self, nr_envs, horizon=1000, action_scaling_factor=0.3, nr_substeps=4,
                 initial_state_noise=0.0, perturbation_chance=0.0, perturbation_velocity=0.5):
        self.nr_envs = nr_envs
        self.horizon = horizon
        self.action_scaling_factor = action_scaling_factor
        self.nr_substeps = nr_substeps
        # domain randomization (robot_locomotion parity slice): reset-pose
        # noise and random torso velocity kicks during rollouts
        self.initial_state_noise = initial_state_noise
        self.perturbation_chance = perturbation_chance
        self.perturbation_velocity = perturbation_velocity

        self.model = load_mjcf(xml_path=ANT_XML, keyframe="home")
        self.xml_path = ANT_XML  # offscreen render path (rlx_tpu.render)
        self.nominal_joint_positions = jnp.asarray(self.model.qpos0[7:])
        self.nr_joints = self.model.nv - 6

        self.target_local_x_velocity = 2.0
        self.target_local_y_velocity = 0.0

        # Per-hinge limits in dof order (bodies without joints contribute none).
        from rlx_tpu.physics.model import HINGE

        hinge_rows = sorted(
            (int(self.model.dof_adr[i]), i)
            for i in range(self.model.nbody)
            if int(self.model.jnt_type[i]) == HINGE
        )
        joint_low = jnp.asarray([self.model.jnt_range[i, 0] for _, i in hinge_rows])
        joint_high = jnp.asarray([self.model.jnt_range[i, 1] for _, i in hinge_rows])
        self.single_action_space = BoxSpace(
            low=joint_low, high=joint_high, shape=(self.nr_joints,),
            center=self.nominal_joint_positions,
            scale=jnp.full((self.nr_joints,), action_scaling_factor),
        )
        self.single_observation_space = BoxSpace(
            low=-jnp.inf, high=jnp.inf, shape=(1 + 2 * self.nr_joints + 9 + self.nr_joints,)
        )

    def initial_physics(self, key, eval_mode):
        qpos = jnp.tile(jnp.asarray(self.model.qpos0)[None], (self.nr_envs, 1))
        qvel = jnp.zeros((self.nr_envs, self.model.nv))
        if self.initial_state_noise > 0.0 and not eval_mode:
            joint_key, vel_key = jax.random.split(key)
            qpos = qpos.at[:, 7:].add(
                self.initial_state_noise * jax.random.normal(joint_key, (self.nr_envs, self.nr_joints))
            )
            qvel = qvel + self.initial_state_noise * jax.random.normal(vel_key, qvel.shape)
        ctrl = jnp.tile(self.nominal_joint_positions[None], (self.nr_envs, 1))
        return AntPhysics(qpos=qpos, qvel=qvel, ctrl=ctrl)

    def observe(self, physics):
        qpos, qvel = physics.qpos, physics.qvel
        height = qpos[:, 2:3]
        joint_positions = qpos[:, 7:] - self.nominal_joint_positions[None]
        joint_velocities = qvel[:, 6:]
        local_angular_velocities = qvel[:, 3:6]  # free-joint ang vel is body-local

        R = quat_to_rot(qpos[:, 3:7])  # body -> world
        # world -> body: transpose
        local_linear_velocities = jnp.einsum("bji,bj->bi", R, qvel[:, :3])
        projected_gravity = jnp.einsum("bji,bj->bi", R, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (qpos.shape[0], 3)))

        observation = jnp.concatenate(
            [height, joint_positions, joint_velocities,
             local_linear_velocities, local_angular_velocities,
             projected_gravity, physics.ctrl],
            axis=-1,
        )
        observation = jnp.nan_to_num(observation, nan=0.0, posinf=0.0, neginf=0.0)
        return jnp.clip(observation, -100.0, 100.0)

    def transition(self, physics, action, key):
        ctrl = self.nominal_joint_positions[None] + action * self.action_scaling_factor
        qvel_in = physics.qvel
        if self.perturbation_chance > 0.0:
            kick_key, dir_key = jax.random.split(key)
            kicked = jax.random.uniform(kick_key, (self.nr_envs,)) < self.perturbation_chance
            kick = self.perturbation_velocity * jax.random.normal(dir_key, (self.nr_envs, 2))
            qvel_in = qvel_in.at[:, :2].add(jnp.where(kicked[:, None], kick, 0.0))
        qpos, qvel = engine.step(self.model, physics.qpos, qvel_in, ctrl, nr_substeps=self.nr_substeps)
        new_physics = AntPhysics(qpos=qpos, qvel=qvel, ctrl=ctrl)

        R = quat_to_rot(qpos[:, 3:7])
        local_linear_velocity = jnp.einsum("bji,bj->bi", R, qvel[:, :3])
        target = jnp.array([self.target_local_x_velocity, self.target_local_y_velocity])
        xy_velocity_difference_norm = jnp.sum(
            jnp.square(target[None] - local_linear_velocity[:, :2]), axis=-1
        )
        tracking_reward = jnp.exp(-xy_velocity_difference_norm / 0.25)
        reward = jnp.clip(jnp.nan_to_num(tracking_reward, nan=0.0, posinf=0.0, neginf=0.0), -10.0, 10.0)

        terminated = (qpos[:, 2] < 0.2) | (qpos[:, 2] > 1.0)
        info = {
            "env_info/reward_xy_vel_cmd": tracking_reward,
            "env_info/xy_vel_diff_norm": xy_velocity_difference_norm,
        }
        return new_physics, reward, terminated, info

    def info_spec(self):
        zeros = jnp.zeros(self.nr_envs)
        return {"env_info/reward_xy_vel_cmd": zeros, "env_info/xy_vel_diff_norm": zeros}
