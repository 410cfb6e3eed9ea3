"""Robot locomotion environment: velocity-command tracking with terrain,
curriculum and 8-axis domain randomization, batched-native on the pure-JAX
physics engine.

Re-cut of the reference's largest environment family,
`rl_x/environments/custom_mujoco/robot_locomotion/mjx/environment.py:34-578`,
redesigned TPU-first:

- the env batch is stepped as ``[B, ...]`` arrays (batch-last inside the
  engine) instead of vmapping per-env mjx models — the env axis shards
  directly over the mesh dp axis;
- per-env model randomization feeds the engine's ``DomainParams``
  multipliers instead of rewriting model pytrees per env;
- per-env terrain is a height grid carried in the state and queried by the
  engine's penalty contacts (no hfield asset swapping);
- auto-reset is where-masked inside step (no lax.cond), with curriculum /
  terrain / DR state carried across episode boundaries exactly as the
  reference's ``_reset`` does.

Observation layout, normalization constants, reward terms, command logic,
curriculum rule and the policy/critic asymmetric observation index protocol
follow the reference (`environment.py:459-572`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.env import EnvState, tree_where
from rlx_tpu.environments.locomotion.robot.robots.configs import ROBOT_CONFIGS
from rlx_tpu.environments.locomotion.robot.tpu import components as comp
from rlx_tpu.environments.locomotion.robot.tpu import randomization as dr
from rlx_tpu.environments.locomotion.robot.tpu.rewards import get_reward_function
from rlx_tpu.environments.locomotion.robot.tpu.terrain import get_terrain_function
from rlx_tpu.environments.spaces import BoxSpace
from rlx_tpu.physics import engine, load_mjcf
from rlx_tpu.physics.engine import DomainParams
from rlx_tpu.physics.spatial import quat_to_rot


class LocomotionEnv:
    def __init__(self, env_config, nr_envs):
        self.env_config = env_config
        self.nr_envs = nr_envs
        self.robot_config = ROBOT_CONFIGS[env_config.robot]
        self.robot_dimensions_mean = self.robot_config["robot_dimensions_mean"]

        self.model = load_mjcf(xml_path=self.robot_config["xml_path"], keyframe="home")
        self.xml_path = self.robot_config["xml_path"]  # offscreen render path
        m = self.model
        self.timestep = float(env_config.timestep) if env_config.timestep > 0 else m.timestep
        if abs(self.timestep - m.timestep) > 1e-9:
            self.model = m = m._replace(timestep=self.timestep)

        # --- static robot indices -----------------------------------------
        self.nr_actuator_joints = len(m.act_dof)
        self.actuator_dof_adr = np.asarray(
            [m.dof_adr[b] for b in m.act_joint_body], dtype=np.int32
        )
        self.actuator_qpos_adr = np.asarray(
            [m.qpos_adr[b] for b in m.act_joint_body], dtype=np.int32
        )
        self.nominal_joint_positions = jnp.asarray(m.qpos0[self.actuator_qpos_adr])
        self.max_joint_velocities = jnp.asarray(
            self.robot_config["actuator_joint_max_velocities"], dtype=jnp.float32
        )
        self.total_mass = float(np.sum(m.body_mass))

        joint_ranges = np.asarray(
            [m.jnt_range[b] for b in m.act_joint_body], dtype=np.float32
        )  # [nu, 2]
        self.joint_ranges = joint_ranges
        soft = env_config.reward["soft_joint_position_limit"]
        mid = joint_ranges.mean(axis=1)
        half = (joint_ranges[:, 1] - joint_ranges[:, 0]) / 2.0 * soft
        self.soft_joint_limits = jnp.asarray(np.stack([mid - half, mid + half], axis=1))

        capacity = np.abs(np.asarray(m.act_forcerange)).max(axis=1)
        capacity = np.where(np.isfinite(capacity) & (capacity > 0), capacity, 1.0)
        self.actuator_force_capacity = jnp.asarray(capacity, dtype=jnp.float32)

        # feet: geoms named '*_foot'; collision spheres: group 5
        foot_geoms = [g for g, name in enumerate(m.geom_name) if name.endswith("_foot")]
        self.nr_feet = len(foot_geoms)
        self.feet_body = np.asarray([m.geom_body[g] for g in foot_geoms], dtype=np.int32)
        self.feet_local_pos = np.asarray([m.geom_pos[g] for g in foot_geoms], dtype=np.float32)
        self.foot_radius = float(m.geom_size[foot_geoms[0], 0])

        # logical foot groups: multi-sphere feet (heel+toe) share one gait
        # state — air/ground timers see the OR of the group's contacts, so a
        # heel-toe roll is not penalized as an extra "foot" (matches the
        # reference's box-foot semantics, unitree_g1). [nf, nf] bool matrix:
        # same_group[i, j] = spheres i and j belong to the same logical foot.
        groups = self.robot_config.get("foot_groups")
        if groups is None:
            groups = [[i] for i in range(self.nr_feet)]
        self.foot_groups = groups
        same = np.zeros((self.nr_feet, self.nr_feet), dtype=bool)
        for group in groups:
            for i in group:
                for j in group:
                    same[i, j] = True
        self.foot_same_group = jnp.asarray(same)

        col_geoms = [g for g in range(len(m.geom_name)) if m.geom_group[g] == 5]
        self.collision_body = np.asarray([m.geom_body[g] for g in col_geoms], dtype=np.int32)
        self.collision_local_pos = np.asarray([m.geom_pos[g] for g in col_geoms], dtype=np.float32)
        self.collision_sphere_radii = jnp.asarray(
            [m.geom_size[g, 0] for g in col_geoms], dtype=jnp.float32
        )

        # nominal standing FK: heights and baseline collision overlaps
        qpos0 = jnp.asarray(m.qpos0)[None]
        R0, p0 = engine.kinematics(m, qpos0)
        feet0 = np.asarray(
            p0[:, self.feet_body] + jnp.einsum(
                "bfij,fj->bfi", R0[:, self.feet_body], jnp.asarray(self.feet_local_pos)
            )
        )[0]
        col0 = np.asarray(
            p0[:, self.collision_body] + jnp.einsum(
                "bfij,fj->bfi", R0[:, self.collision_body], jnp.asarray(self.collision_local_pos)
            )
        )[0]
        self.feet_symmetry_pairs = _symmetry_pairs(feet0)
        self.nominal_imu_height_over_ground = float(m.qpos0[2])
        self.nominal_qpos_height_over_ground = float(m.qpos0[2])
        d0 = np.linalg.norm(np.asarray(col0)[:, None] - np.asarray(col0)[None], axis=-1)
        r = np.asarray(self.collision_sphere_radii)
        touch0 = d0 <= (r[:, None] + r[None])
        self.nr_collisions_in_nominal = int((touch0.sum() - len(r)) // 2)
        self.ground_penetration_in_nominal = jnp.asarray(
            np.maximum(r - np.asarray(col0)[:, 2], 0.0), dtype=jnp.float32
        )

        # --- components ----------------------------------------------------
        self.control_function = comp.get_control_function(env_config.control_type, self)
        self.control_frequency_hz = self.robot_config["control_frequency_hz"]
        self.nr_substeps = int(round(1.0 / self.control_frequency_hz / self.timestep))
        self.dt = self.timestep * self.nr_substeps
        self.horizon = int(round(env_config.episode_length_in_seconds * self.control_frequency_hz))

        self.command_function = comp.get_command_function(env_config.command["type"], self, env_config.command)
        self.command_sampling = comp.get_sampling_function(env_config.command["sampling_type"], self)
        self.termination_function = comp.get_termination_function(
            env_config.termination["type"], self, env_config.termination
        )
        self.terrain_function = get_terrain_function(env_config.terrain["type"], self, env_config.terrain)
        self.reward_function = get_reward_function(env_config.reward["type"], self, env_config.reward)

        drc = env_config.domain_randomization
        get_dr = dr.get_domain_randomization_function
        self.dr_sampling = comp.get_sampling_function(drc["sampling_type"], self)
        self.perturbation_sampling = comp.get_sampling_function(drc["perturbation"]["sampling_type"], self)
        self.action_delay = get_dr("action_delay", drc["action_delay"]["type"], self, drc["action_delay"])
        self.initial_state = get_dr("initial_state", drc["initial_state"]["type"], self, drc["initial_state"])
        self.observation_noise = get_dr("observation_noise", drc["observation_noise"]["type"], self, drc["observation_noise"])
        self.joint_dropout = get_dr("joint_dropout", drc["joint_dropout"]["type"], self, drc["joint_dropout"])
        self.model_dr = get_dr("mujoco_model", drc["mujoco_model"]["type"], self, drc["mujoco_model"])
        self.perturbation = get_dr("perturbation", drc["perturbation"]["type"], self, drc["perturbation"])
        self.seen_robot = get_dr("seen_robot", drc["seen_robot"]["type"], self, drc["seen_robot"])
        self.unseen_robot = get_dr("unseen_robot", drc["unseen_robot"]["type"], self, drc["unseen_robot"])

        self.curriculum_nr_levels = env_config.env_curriculum_nr_levels
        self.curriculum_success_vel_diff = env_config.env_curriculum_level_success_normalized_xy_vel_diff
        self.curriculum_success_length = env_config.env_curriculum_level_success_episode_length

        self.policy_exteroception = comp.get_exteroceptive_observation_function(
            env_config.policy_exteroceptive_observation_type, self
        )
        self.critic_exteroception = comp.get_exteroceptive_observation_function(
            env_config.critic_exteroceptive_observation_type, self
        )

        # --- spaces + observation index layout ------------------------------
        nu, nf = self.nr_actuator_joints, self.nr_feet
        self.single_action_space = BoxSpace(
            low=joint_ranges[:, 0], high=joint_ranges[:, 1], shape=(nu,),
            center=self.nominal_joint_positions,
            scale=jnp.full((nu,), self.robot_config["scaling_factor"]),
        )
        self._build_observation_indices(nu, nf)

    # --- variant hooks (soccer et al.) ----------------------------------------

    def nr_extra_observations(self):
        """Extra observation channels appended after exteroception (e.g.
        gait-phase features); variants override together with
        ``extra_observation``."""
        return 0

    def extra_observation(self, internal):
        """[B, nr_extra_observations()] un-normalized extra channels."""
        return None

    def extra_internal_init(self, nr_envs):
        """Extra internal-state entries created at reset."""
        return {}

    def extra_episode_start(self, internal, mask, key, eval_mode):
        """Masked per-episode re-sampling of variant state."""
        return internal

    def internal_step_update(self, internal):
        """Per-control-step variant state advance (after reward + obs, like
        the reference's gait step at `robocup_soccer/.../environment.py:439`)."""
        return internal

    # --- static helpers ------------------------------------------------------

    def _build_observation_indices(self, nu, nf):
        """Observation layout + asymmetric policy/critic index protocol
        (`environment.py:520-572`)."""
        idx = 0

        def take(k):
            nonlocal idx
            out = np.arange(idx, idx + k)
            idx += k
            return out

        self.joint_positions_obs_idx = take(nu)
        self.joint_velocities_obs_idx = take(nu)
        self.joint_previous_actions_obs_idx = take(nu)
        self.feet_ground_contact_obs_idx = take(nf)
        self.feet_time_on_ground_obs_idx = take(nf)
        self.feet_time_in_air_obs_idx = take(nf)
        self.imu_linear_vel_obs_idx = take(3)
        self.imu_angular_vel_obs_idx = take(3)
        self.goal_velocities_obs_idx = take(3)
        self.gravity_vector_obs_idx = take(3)
        self.policy_exteroception_obs_idx = take(self.policy_exteroception.nr_exteroceptive_observations)
        self.critic_exteroception_obs_idx = take(self.critic_exteroception.nr_exteroceptive_observations)
        self.extra_obs_idx = take(self.nr_extra_observations())

        self.single_observation_space = BoxSpace(low=-np.inf, high=np.inf, shape=(idx,))
        self.policy_observation_indices = jnp.asarray(
            np.concatenate([
                self.joint_positions_obs_idx,
                self.joint_velocities_obs_idx,
                self.joint_previous_actions_obs_idx,
                self.imu_angular_vel_obs_idx,
                self.goal_velocities_obs_idx,
                self.gravity_vector_obs_idx,
                self.policy_exteroception_obs_idx,
                self.extra_obs_idx,
            ]).astype(np.int32)
        )
        self.critic_observation_indices = jnp.asarray(
            np.concatenate([
                self.joint_positions_obs_idx,
                self.joint_velocities_obs_idx,
                self.joint_previous_actions_obs_idx,
                self.feet_ground_contact_obs_idx,
                self.feet_time_on_ground_obs_idx,
                self.feet_time_in_air_obs_idx,
                self.imu_linear_vel_obs_idx,
                self.imu_angular_vel_obs_idx,
                self.goal_velocities_obs_idx,
                self.gravity_vector_obs_idx,
                self.critic_exteroception_obs_idx,
                self.extra_obs_idx,
            ]).astype(np.int32)
        )

    def feet_world_positions(self, qpos):
        R, p = engine.kinematics(self.model, qpos)
        return p[:, self.feet_body] + jnp.einsum(
            "bfij,fj->bfi", R[:, self.feet_body], jnp.asarray(self.feet_local_pos)
        )

    def _domain_params(self, internal):
        """Assemble engine DomainParams (batch-last) from internal state."""
        nv = self.model.nv
        dof_scale = np.ones((nv,), np.float32)
        # joint dropout: locked joints get huge damping; build [nv, B]
        damping = jnp.ones((nv, self.nr_envs)) * (
            internal["seen_damping_scale"] * internal["unseen_damping_scale"]
        )[None, :]
        lock = self.joint_dropout.damping_mask(internal)           # [B, nu]
        damping = damping.at[self.actuator_dof_adr].mul(lock.T)
        kp = (
            internal["seen_kp_scale"] * internal["unseen_kp_scale"]
            * self.joint_dropout.kp_mask(internal)
        ).T
        kv = (internal["seen_kv_scale"] * internal["unseen_kv_scale"]).T
        return DomainParams(
            mass_scale=(internal["seen_mass_scale"] * internal["unseen_mass_scale"]).T,
            damping_scale=damping,
            frictionloss_scale=internal["seen_frictionloss_scale"],
            armature_scale=internal["seen_armature_scale"],
            friction_scale=internal["dr_friction_scale"],
            contact_stiffness_scale=internal["dr_contact_stiffness_scale"],
            kp_scale=kp,
            kv_scale=kv,
            forcerange_scale=internal["seen_forcerange_scale"].T,
            ctrl_offset=None,  # offsets are folded into the target by PDControl
            gravity=internal["dr_gravity"].T,
        )

    # --- protocol --------------------------------------------------------------

    def reset(self, key, eval_mode=False):
        B = self.nr_envs
        key, k_init, k_terrain, k_dr, k_cmd_s, k_cmd = jax.random.split(key, 6)

        internal = {}
        internal.update(self.command_function.init_state(B))
        internal.update(self.reward_function.init_state(B))
        internal.update(self.action_delay.init_state(B))
        internal.update(self.joint_dropout.init_state(B))
        internal.update(self.model_dr.init_state(B))
        internal.update(self.seen_robot.init_state(B))
        internal.update(self.unseen_robot.init_state(B))
        internal.update(self.terrain_function.init_state(B))
        internal["env_curriculum_coeff"] = jnp.full(B, 1.0 if eval_mode else 0.0)
        internal["env_curriculum_levels_in_a_row"] = jnp.zeros(B)
        internal["max_command_velocity"] = jnp.full(B, self.command_function.max_command_velocity())
        internal["last_action"] = jnp.zeros((B, self.nr_actuator_joints))
        internal["second_last_action"] = jnp.zeros((B, self.nr_actuator_joints))
        internal["imu_height_over_ground"] = jnp.full(B, self.nominal_imu_height_over_ground)
        internal.update(self.extra_internal_init(B))

        internal, qpos, qvel = self._episode_start(
            internal, jnp.ones(B, bool), k_terrain, k_init, k_dr, k_cmd_s, k_cmd, eval_mode
        )

        physics = {
            "qpos": qpos, "qvel": qvel, "internal": internal,
            # stick-friction anchors carried across control steps (static
            # friction holds across calls; see engine.contact_anchor_init)
            "contact_anchor": engine.contact_anchor_init(self.model, qpos),
        }
        observation, _ = self._observe(physics, jnp.zeros((B, self.nr_actuator_joints)), key)

        zeros = jnp.zeros(B)
        falses = jnp.zeros(B, bool)
        info = {
            "rollout/episode_return": zeros,
            "rollout/episode_length": zeros,
            "rollout/episode_tracking": zeros,
            "env_curriculum/coefficient": internal["env_curriculum_coeff"],
        }
        for name in self.reward_function_info_keys():
            info[name] = zeros
        episode_store = {
            "episode_return": zeros,
            "episode_length": zeros,
            "episode_total_xy_velocity_diff_abs": zeros,
        }
        return EnvState(
            physics=physics, observation=observation, final_observation=observation,
            reward=zeros, terminated=falses, truncated=falses,
            info=info, episode_store=episode_store, key=key, eval_mode=eval_mode,
        )

    def reward_function_info_keys(self):
        keys = [
            "track_xy_vel_cmd", "track_yaw_vel_cmd", "z_velocity", "imu_acceleration",
            "angular_velocity", "angular_position", "actuator_joint_nominal_diff",
            "joint_position_limit", "joint_velocity_limit", "joint_velocity",
            "joint_acceleration", "joint_torque", "power_draw_penalty", "action_rate",
            "action_smoothness", "collision", "ground_penetration", "base_height",
            "foot_air_time", "symmetry_air", "foot_slip", "foot_z_velocity", "total",
        ]
        return [f"reward/{k}" for k in keys] + [
            "env_info/xy_vel_diff_abs", "env_info/xy_vel_diff_abs_normalized",
        ]

    def _episode_start(self, internal, mask, k_terrain, k_init, k_dr, k_cmd_s, k_cmd, eval_mode):
        """Per-env episode initialization for envs selected by ``mask`` [B]
        (the reference's ``_reset``, `environment.py:330-390`)."""
        B = mask.shape[0]
        cc = internal["env_curriculum_coeff"]

        # terrain resample (masked)
        fresh = self.terrain_function.sample(dict(internal), k_terrain, cc)
        internal = tree_where(mask, fresh, internal) if fresh is not internal else internal
        center = self.terrain_function.center_height(internal)
        internal["center_height"] = center if center is not None else jnp.zeros(B)

        # domain randomization at episode start: forced in eval mode
        # (`environment.py:505`), sampled otherwise
        should = self.dr_sampling.setup(k_dr, B) | jnp.full(B, bool(eval_mode))
        should = should & mask
        keys = jax.random.split(k_dr, 7)
        internal = self.seen_robot.sample(internal, should, keys[0], cc)
        internal = self.unseen_robot.sample(internal, should, keys[1], cc)
        internal = self.model_dr.sample(internal, should, keys[2], cc)
        internal = self.action_delay.sample(internal, should, keys[3], cc)
        internal = self.joint_dropout.sample(internal, should, keys[4], cc)

        # clear per-episode accumulators on masked envs
        zeroed = dict(internal)
        zeroed.update(self.reward_function.init_state(B))
        zeroed.update(self.action_delay.setup(dict(internal)))
        zeroed["last_action"] = jnp.zeros_like(internal["last_action"])
        zeroed["second_last_action"] = jnp.zeros_like(internal["second_last_action"])
        internal = tree_where(mask, zeroed, internal)

        # commands (forced at episode start)
        should_cmd = self.command_sampling.setup(k_cmd_s, B) & mask
        internal = self.command_function.get_next_command(internal, should_cmd, k_cmd)

        qpos, qvel = self.initial_state.setup(internal, k_init, cc)
        internal["imu_height_over_ground"] = jnp.where(
            mask, qpos[:, 2] - internal["center_height"], internal["imu_height_over_ground"]
        )
        # feet velocities are FK finite differences; seed previous positions
        # with the reset pose so the first step reads ~zero foot velocity
        internal["previous_feet_positions"] = tree_where(
            mask, self.feet_world_positions(qpos), internal["previous_feet_positions"]
        )
        internal = self.extra_episode_start(
            internal, mask, jax.random.fold_in(k_dr, 101), eval_mode
        )
        return internal, qpos, qvel

    def _trunk_frame(self, qpos, qvel):
        R = quat_to_rot(qpos[:, 3:7])                       # body -> world
        local_lin = jnp.einsum("bji,bj->bi", R, qvel[:, :3])
        local_ang = qvel[:, 3:6]                            # already body-local
        roll = jnp.arctan2(R[:, 2, 1], R[:, 2, 2])
        pitch = -jnp.arcsin(jnp.clip(R[:, 2, 0], -1.0, 1.0))
        yaw = jnp.arctan2(R[:, 1, 0], R[:, 0, 0])
        euler = jnp.stack([roll, pitch, yaw], axis=1)
        gravity_vec = jnp.einsum("bji,bj->bi", R, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), R.shape[:1] + (3,)))
        return R, local_lin, local_ang, euler, gravity_vec

    def _physical_quantities(self, qpos, qvel, internal, action):
        """FK-derived quantities shared by reward and observation (the
        engine-side stand-in for the reference's sensordata reads)."""
        R_all, p_all = engine.kinematics(self.model, qpos)
        _, local_lin, local_ang, euler, gravity_vec = self._trunk_frame(qpos, qvel)

        feet_pos = p_all[:, self.feet_body] + jnp.einsum(
            "bfij,fj->bfi", R_all[:, self.feet_body], jnp.asarray(self.feet_local_pos)
        )
        col_pos = p_all[:, self.collision_body] + jnp.einsum(
            "bfij,fj->bfi", R_all[:, self.collision_body], jnp.asarray(self.collision_local_pos)
        )
        ground_at_feet = self.terrain_function.height_at(internal, feet_pos[..., 0], feet_pos[..., 1])
        feet_contacts = (feet_pos[..., 2] - self.foot_radius) <= ground_at_feet
        feet_vel = (feet_pos - internal["previous_feet_positions"]) / self.dt

        target = self.control_function.process_action(action, internal)
        dp = self._domain_params(internal)
        torques = engine.actuator_forces_T(self.model, qpos.T, qvel.T, target.T, dp).T

        return {
            "imu_linear_velocity": local_lin,
            "imu_angular_velocity": local_ang,
            "imu_orientation_euler": euler,
            "joint_positions": qpos[:, self.actuator_qpos_adr],
            "joint_velocities": qvel[:, self.actuator_dof_adr],
            "feet_contacts": feet_contacts,
            "feet_velocities": feet_vel,
            "feet_positions": feet_pos,
            "feet_rotations": R_all[:, self.feet_body],  # [B, nf, 3, 3] body->world
            "collision_sphere_positions": col_pos,
            "joint_torques": torques,
            "gravity_vector": gravity_vec,
            "trunk_pos": p_all[:, 0],
            "trunk_yaw": euler[:, 2],
        }

    def _assemble_observation(self, internal, obsdata, action, key):
        """Concatenate, noise, normalize (`environment.py:459-495`)."""
        policy_ext = self.policy_exteroception.get(internal, obsdata["trunk_pos"], obsdata["trunk_yaw"])
        critic_ext = self.critic_exteroception.get(internal, obsdata["trunk_pos"], obsdata["trunk_yaw"])
        observation = jnp.concatenate(
            [
                obsdata["joint_positions"], obsdata["joint_velocities"], action,
                obsdata["feet_contacts"].astype(jnp.float32),
                internal["feet_time_on_ground"], internal["feet_time_in_air"],
                obsdata["imu_linear_velocity"], obsdata["imu_angular_velocity"],
                internal["goal_velocities"], obsdata["gravity_vector"],
                policy_ext, critic_ext,
            ]
            + ([self.extra_observation(internal)] if len(self.extra_obs_idx) > 0 else []),
            axis=1,
        )
        observation = self.observation_noise.modify(internal, observation, key)

        # normalize + clip (`environment.py:479-493`)
        o = observation
        o = o.at[:, self.joint_positions_obs_idx].set(
            (o[:, self.joint_positions_obs_idx] - internal["actuator_joint_nominal_positions"]) / 3.14
        )
        o = o.at[:, self.joint_velocities_obs_idx].set(o[:, self.joint_velocities_obs_idx] / 100.0)
        o = o.at[:, self.joint_previous_actions_obs_idx].set(o[:, self.joint_previous_actions_obs_idx] / 10.0)
        o = o.at[:, self.feet_ground_contact_obs_idx].set(o[:, self.feet_ground_contact_obs_idx] / 0.5 - 1.0)
        o = o.at[:, self.feet_time_on_ground_obs_idx].set(
            jnp.clip(o[:, self.feet_time_on_ground_obs_idx] / 2.5 - 1.0, -1.0, 1.0)
        )
        o = o.at[:, self.feet_time_in_air_obs_idx].set(
            jnp.clip(o[:, self.feet_time_in_air_obs_idx] / 2.5 - 1.0, -1.0, 1.0)
        )
        o = o.at[:, self.imu_linear_vel_obs_idx].set(jnp.clip(o[:, self.imu_linear_vel_obs_idx] / 10.0, -1.0, 1.0))
        o = o.at[:, self.imu_angular_vel_obs_idx].set(jnp.clip(o[:, self.imu_angular_vel_obs_idx] / 50.0, -1.0, 1.0))
        for idx in (self.policy_exteroception_obs_idx, self.critic_exteroception_obs_idx):
            if len(idx) > 0:
                o = o.at[:, idx].set(jnp.clip(o[:, idx] / 5.0 - 1.0, -1.0, 1.0))
        o = jnp.nan_to_num(o, nan=0.0, posinf=0.0, neginf=0.0)
        o = jnp.clip(o, -10.0, 10.0)
        return o

    def _observe(self, physics, action, key):
        """Physical quantities + assembled observation in one call."""
        obsdata = self._physical_quantities(
            physics["qpos"], physics["qvel"], physics["internal"], action
        )
        observation = self._assemble_observation(physics["internal"], obsdata, action, key)
        return observation, obsdata

    def step(self, state, action):
        """One control step; ordering follows the reference's ``_step``
        (`environment.py:399-456`): physics -> DR -> reward (old commands) ->
        command resample -> observation (new commands, stale feet timers) ->
        termination -> edge teleport + bookkeeping -> masked auto-reset."""
        physics = state.physics
        internal = dict(physics["internal"])
        B = self.nr_envs
        key, k_pert_s, k_pert, k_dr_s, k_dr, k_cmd_s, k_cmd, k_obs, k_reset_obs, k_reset = (
            jax.random.split(state.key, 10)
        )

        # --- act: delay -> PD targets -> physics ---------------------------
        delayed, internal = self.action_delay.delay_action(action, internal)  # [S, B, nu]
        targets = jax.vmap(lambda a: self.control_function.process_action(a, internal))(delayed)
        dp = self._domain_params(internal)
        terrain = self.terrain_function.engine_terrain(internal)
        qpos, qvel, contact_anchor = engine.step(
            self.model, physics["qpos"], physics["qvel"], targets[0],
            nr_substeps=self.nr_substeps, dr=dp, terrain=terrain, ctrl_sequence=targets,
            contact_state=physics["contact_anchor"],
        )

        # velocity clipping (`environment.py:413-415`)
        max_qvel = jnp.full((B, self.model.nv), 100.0)
        max_qvel = max_qvel.at[:, self.actuator_dof_adr].set(internal["actuator_joint_max_velocities"])
        qvel = jnp.clip(qvel, -max_qvel, max_qvel)

        # --- in-episode domain randomization --------------------------------
        cc = internal["env_curriculum_coeff"]
        should_dr = self.dr_sampling.step(k_dr_s, B)
        keys = jax.random.split(k_dr, 5)
        internal = self.seen_robot.sample(internal, should_dr, keys[0], cc)
        internal = self.unseen_robot.sample(internal, should_dr, keys[1], cc)
        internal = self.model_dr.sample(internal, should_dr, keys[2], cc)
        internal = self.action_delay.sample(internal, should_dr, keys[3], cc)
        internal = self.joint_dropout.sample(internal, should_dr, keys[4], cc)
        should_pert = self.perturbation_sampling.step(k_pert_s, B, cc)
        qpos, qvel = self.perturbation.sample(qpos, qvel, internal, should_pert, k_pert)

        # --- terrain height bookkeeping --------------------------------------
        trunk_xy_ground = self.terrain_function.height_at(
            internal, qpos[:, 0:1], qpos[:, 1:2]
        )[:, 0]
        internal["imu_height_over_ground"] = qpos[:, 2] - trunk_xy_ground

        # --- reward (pre-resample commands, `environment.py:426`) ------------
        obsdata = self._physical_quantities(qpos, qvel, internal, action)
        info = dict(state.info)
        reward, xy_diff_abs = self.reward_function.reward_and_info(internal, obsdata, action, info)

        # --- command resample, then the policy-facing observation ------------
        should_cmd = self.command_sampling.step(k_cmd_s, B)
        internal = self.command_function.get_next_command(internal, should_cmd, k_cmd)
        observation = self._assemble_observation(internal, obsdata, action, k_obs)

        # --- termination / truncation ------------------------------------------
        terminated = self.termination_function.should_terminate(internal)
        terminated = terminated | jnp.any(jnp.abs(qvel[:, :3]) >= 100.0, axis=1)
        episode_length = state.episode_store["episode_length"] + 1.0
        truncated = (episode_length >= self.horizon) & ~terminated
        done = terminated | truncated

        # --- bookkeeping -----------------------------------------------------
        internal = self.reward_function.step(
            internal, obsdata["feet_contacts"], obsdata["joint_velocities"],
            obsdata["imu_linear_velocity"], obsdata["feet_positions"],
        )
        internal = self.internal_step_update(internal)
        internal["second_last_action"] = internal["last_action"]
        internal["last_action"] = action
        episode_return = state.episode_store["episode_return"] + reward
        episode_xy_diff = state.episode_store["episode_total_xy_velocity_diff_abs"] + xy_diff_abs

        info["rollout/episode_return"] = jnp.where(done, episode_return, info["rollout/episode_return"])
        info["rollout/episode_length"] = jnp.where(done, episode_length, info["rollout/episode_length"])

        # --- curriculum update on done (`environment.py:343-357`) --------------
        mean_diff = episode_xy_diff / jnp.maximum(episode_length, 1.0)
        mean_norm_diff = mean_diff / jnp.maximum(internal["max_command_velocity"], 1e-6)
        # normalized episode tracking quality in [0, 1]: 1 - mean |v - v_cmd|
        # / v_max over the episode (the curriculum's own success measure) —
        # the benchmark metric for "tracking reward" on this env family
        info["rollout/episode_tracking"] = jnp.where(
            done,
            jnp.clip(1.0 - mean_norm_diff, 0.0, 1.0),
            info["rollout/episode_tracking"],
        )
        success = (mean_norm_diff <= self.curriculum_success_vel_diff) & (
            episode_length >= self.curriculum_success_length
        )
        levels = internal["env_curriculum_levels_in_a_row"]
        levels_new = jnp.where(success, jnp.where(levels >= 0, levels + 1, 1.0),
                               jnp.where(levels < 0, levels - 1, -1.0))
        coeff_new = jnp.clip(cc + levels_new / self.curriculum_nr_levels, 0.0, 1.0)
        coeff_new = jnp.where(jnp.full(B, bool(state.eval_mode)), 1.0, coeff_new)
        internal["env_curriculum_levels_in_a_row"] = jnp.where(done, levels_new, levels)
        internal["env_curriculum_coeff"] = jnp.where(done, coeff_new, cc)
        info["env_curriculum/coefficient"] = internal["env_curriculum_coeff"]

        # --- masked auto-reset (episode-start machinery for done envs) ---------
        rk = jax.random.split(k_reset, 5)
        internal, qpos_r, qvel_r = self._episode_start(
            internal, done, rk[0], rk[1], rk[2], rk[3], rk[4], state.eval_mode
        )

        # terrain edge teleport (`terrain_functions/hfield_diverse.py:77-84`):
        # pose-only re-initialization when the robot walks near the grid edge
        half = self.terrain_function.half_extent_m
        near_edge = (
            ((half - 0.5) < jnp.abs(qpos[:, 0])) & (jnp.abs(qpos[:, 0]) < half)
        ) | (((half - 0.5) < jnp.abs(qpos[:, 1])) & (jnp.abs(qpos[:, 1]) < half))
        pose_mask = done | (near_edge & ~done)
        new_qpos = tree_where(pose_mask, qpos_r, qpos)
        new_qvel = tree_where(pose_mask, qvel_r, qvel)
        contact_anchor = tree_where(
            pose_mask, engine.contact_anchor_init(self.model, new_qpos), contact_anchor
        )

        physics_out = {
            "qpos": new_qpos, "qvel": new_qvel, "internal": internal,
            "contact_anchor": contact_anchor,
        }
        reset_obs, _ = self._observe(physics_out, jnp.zeros_like(action), k_reset_obs)
        new_observation = jnp.where(done[:, None], reset_obs, observation)

        episode_store = {
            "episode_return": jnp.where(done, 0.0, episode_return),
            "episode_length": jnp.where(done, 0.0, episode_length),
            "episode_total_xy_velocity_diff_abs": jnp.where(done, 0.0, episode_xy_diff),
        }
        return state.replace(
            physics=physics_out,
            observation=new_observation,
            final_observation=observation,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info=info,
            episode_store=episode_store,
            key=key,
        )

    def close(self):
        pass


def _symmetry_pairs(feet_world_nominal):
    """Mirror-image foot pairing (`environment.py:114-120`): mutual nearest
    neighbors of the nominal-pose foot positions after folding |y|."""
    folded = np.asarray(feet_world_nominal, dtype=np.float64).copy()
    folded[:, 1] = np.abs(folded[:, 1])
    d = np.linalg.norm(folded[:, None] - folded[None], axis=-1) + np.eye(len(folded)) * 1e3
    nearest = d.argmin(axis=1)
    pairs = sorted(
        {(min(i, nearest[i]), max(i, nearest[i]))
         for i in range(len(folded)) if nearest[nearest[i]] == i}
    )
    if not pairs:
        pairs = [(i, i) for i in range(len(folded))]
    return np.asarray(pairs, dtype=np.int32)
