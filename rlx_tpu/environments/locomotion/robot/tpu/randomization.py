"""Domain randomization: the 8 axes of the reference, batched-native.

Re-cut of `rl_x/environments/custom_mujoco/robot_locomotion/mjx/
domain_randomization/*` for the TPU engine.  The reference rewrites fields
of a per-env mjx model pytree; here every axis samples small per-env arrays
that either (a) feed the engine's ``DomainParams`` multipliers (dynamics
randomization), (b) shift what the controller/observation treats as nominal
(seen-robot), or (c) perturb ``qpos/qvel`` directly (kicks).

Axis -> realization map:
- action_delay   -> per-substep delayed control sequence (ring buffer)
- initial_state  -> randomized reset qpos/qvel (+ terrain-aware foot lift)
- joint_dropout  -> open: servo gain 0; locked: servo gain 0 + huge joint
                    damping (the reference shrinks jnt_range instead)
- mujoco_model   -> contact friction/stiffness scale, gravity vector
- observation_noise -> uniform additive noise at observation indices
- perturbation   -> trunk/joint velocity + position kicks during episodes
- seen_robot     -> nominal positions / action scaling / joint limits /
                    max velocities (controller+obs see the change) plus
                    coupled mass/gain/damping dynamics multipliers
- unseen_robot   -> hidden servo zero offsets and mass/gain multipliers
                    (dynamics only; controller+obs do NOT see them)
"""

import jax
import jax.numpy as jnp
import numpy as np


def _where(should, new, old):
    """Per-env select; ``should`` [B] broadcast over trailing dims."""
    return jnp.where(should.reshape(should.shape + (1,) * (new.ndim - 1)), new, old)


# --- action delay -------------------------------------------------------------

class DefaultActionDelay:
    """Ring buffer of past targets; each substep reads a delayed slot
    (`domain_randomization/action_delay_functions/default.py`)."""

    def __init__(self, env, cfg):
        self.env = env
        self.min_delay_substeps = round(cfg["min_delay_s"] / env.timestep)
        self.max_delay_substeps = round(cfg["max_delay_s"] / env.timestep)
        self.buffer_length = self.max_delay_substeps + 1

    def init_state(self, nr_envs):
        nu = self.env.nr_actuator_joints
        return {
            "action_delay_buffer": jnp.zeros((nr_envs, self.buffer_length, nu)),
            "action_delay_ptr": jnp.zeros(nr_envs, jnp.int32),
            "action_delay_steps": jnp.full(nr_envs, self.min_delay_substeps, jnp.int32),
        }

    def setup(self, internal):
        internal = dict(internal)
        internal["action_delay_buffer"] = jnp.zeros_like(internal["action_delay_buffer"])
        internal["action_delay_ptr"] = jnp.zeros_like(internal["action_delay_ptr"])
        return internal

    def sample(self, internal, should, key, curriculum_coeff):
        effective_max = self.min_delay_substeps + jnp.floor(
            curriculum_coeff * (self.max_delay_substeps - self.min_delay_substeps)
        ).astype(jnp.int32)
        sampled = jax.random.randint(
            key, curriculum_coeff.shape, self.min_delay_substeps, self.max_delay_substeps + 1
        )
        sampled = jnp.minimum(sampled, effective_max)
        internal = dict(internal)
        internal["action_delay_steps"] = jnp.where(should, sampled, internal["action_delay_steps"])
        return internal

    def delay_action(self, action, internal):
        """action [B, nu] -> per-substep controls [S, B, nu] + updated buffer."""
        S = self.env.nr_substeps
        L = self.buffer_length
        buffer = internal["action_delay_buffer"]            # [B, L, nu]
        ptr = internal["action_delay_ptr"]                  # [B]
        delay = internal["action_delay_steps"]              # [B]

        sub = jnp.arange(S)                                 # [S]
        read_idx = (ptr[None, :] + sub[:, None] - delay[None, :]) % L   # [S, B]
        # gather buffer[b, read_idx[s, b], :] -> [S, B, nu]
        buffered = jnp.take_along_axis(
            jnp.broadcast_to(buffer, (S,) + buffer.shape),
            read_idx[:, :, None, None],
            axis=2,
        ).squeeze(2)                                        # [S, B, nu]
        delayed = jnp.where((sub[:, None] >= delay[None, :])[:, :, None], action[None], buffered)

        write_idx = (ptr[None, :] + sub[:, None]) % L       # [S, B]
        onehot = (jnp.arange(L)[None, None, :] == write_idx[:, :, None]).any(axis=0)  # [B, L]
        new_buffer = jnp.where(onehot[:, :, None], action[:, None, :], buffer)

        internal = dict(internal)
        internal["action_delay_buffer"] = new_buffer
        internal["action_delay_ptr"] = (ptr + S) % L
        return delayed, internal


class NoneActionDelay(DefaultActionDelay):
    def __init__(self, env, cfg):
        self.env = env
        self.min_delay_substeps = 0
        self.max_delay_substeps = 0
        self.buffer_length = 1

    def sample(self, internal, should, key, curriculum_coeff):
        return internal

    def delay_action(self, action, internal):
        S = self.env.nr_substeps
        return jnp.broadcast_to(action[None], (S,) + action.shape), internal


# --- initial state ------------------------------------------------------------

class RandomInitialState:
    """Randomized reset pose/velocities with terrain-aware foot lift
    (`domain_randomization/initial_state_functions/random.py`)."""

    def __init__(self, env, cfg):
        self.env = env
        self.roll = cfg["roll_angle_pi_factor"] * np.pi
        self.pitch = cfg["pitch_angle_pi_factor"] * np.pi
        self.yaw = cfg["yaw_angle_pi_factor"] * np.pi
        self.joint_offset = cfg["actuator_joint_position_offset_to_nominal"]
        self.joint_nominal_factor = cfg["actuator_joint_nominal_position_factor"]
        self.joint_velocity_max_factor = cfg["joint_velocity_max_factor"]
        self.trunk_velocity_clip_mass_factor = cfg["trunk_velocity_clip_mass_factor"]
        self.trunk_velocity_clip_limit = cfg["trunk_velocity_clip_limit"]

    def setup(self, internal, key, curriculum_coeff):
        """-> (qpos [B, nq], qvel [B, nv])."""
        env = self.env
        B = curriculum_coeff.shape[0]
        cc = curriculum_coeff
        keys = jax.random.split(key, 7)

        rpy_max = jnp.asarray([self.roll, self.pitch, self.yaw])
        rpy = cc[:, None] * jax.random.uniform(keys[0], (B, 3), minval=-1.0, maxval=1.0) * rpy_max
        quat = _rpy_to_quat(rpy)

        nominal = internal["actuator_joint_nominal_positions"]      # [B, nu]
        factor = cc[:, None] * self.joint_nominal_factor
        joints = nominal * jax.random.uniform(
            keys[1], nominal.shape, minval=1.0 - factor, maxval=1.0 + factor
        )
        joints = joints + cc[:, None] * jax.random.uniform(
            keys[2], nominal.shape, minval=-self.joint_offset, maxval=self.joint_offset
        )
        joints = jnp.clip(
            joints,
            internal["joint_position_limits"][..., 0],
            internal["joint_position_limits"][..., 1],
        )

        jv_factor = cc[:, None] * self.joint_velocity_max_factor
        joint_vels = internal["actuator_joint_max_velocities"] * jax.random.uniform(
            keys[3], nominal.shape, minval=-jv_factor, maxval=jv_factor
        )

        max_trunk_v = min(
            float(env.total_mass) * self.trunk_velocity_clip_mass_factor,
            self.trunk_velocity_clip_limit,
        )
        lin_v = cc[:, None] * jax.random.uniform(keys[4], (B, 3), minval=-max_trunk_v, maxval=max_trunk_v)
        ang_v = cc[:, None] * jax.random.uniform(keys[5], (B, 3), minval=-max_trunk_v, maxval=max_trunk_v)

        center = internal.get("center_height", jnp.zeros(B))
        qpos = jnp.tile(jnp.asarray(env.model.qpos0)[None], (B, 1))
        qpos = qpos.at[:, 2].set(env.nominal_qpos_height_over_ground + center)
        qpos = qpos.at[:, 3:7].set(quat)
        qpos = qpos.at[:, env.actuator_qpos_adr].set(joints)

        qvel = jnp.zeros((B, env.model.nv))
        qvel = qvel.at[:, 0:3].set(lin_v)
        qvel = qvel.at[:, 3:6].set(ang_v)
        qvel = qvel.at[:, env.actuator_dof_adr].set(joint_vels)

        # lift so no foot starts under the (possibly rough) ground
        feet_pos = env.feet_world_positions(qpos)                   # [B, nf, 3]
        ground = env.terrain_function.height_at(
            internal, feet_pos[..., 0], feet_pos[..., 1]
        )
        lift = jnp.max(ground + env.foot_radius - feet_pos[..., 2], axis=1)
        qpos = qpos.at[:, 2].add(jnp.maximum(lift, 0.0))
        return qpos, qvel


def _rpy_to_quat(rpy):
    """[B, 3] xyz euler -> [B, 4] wxyz quaternion."""
    half = rpy / 2.0
    cr, cp, cy = jnp.cos(half[:, 0]), jnp.cos(half[:, 1]), jnp.cos(half[:, 2])
    sr, sp, sy = jnp.sin(half[:, 0]), jnp.sin(half[:, 1]), jnp.sin(half[:, 2])
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=1,
    )


class NominalInitialState(RandomInitialState):
    """No randomization: keyframe pose at nominal height over local ground."""

    def setup(self, internal, key, curriculum_coeff):
        return super().setup(internal, key, jnp.zeros_like(curriculum_coeff))


# --- observation noise ---------------------------------------------------------

class DefaultObservationNoise:
    def __init__(self, env, cfg):
        self.env = env
        self.cfg = dict(cfg)

    def modify(self, internal, observation, key):
        env = self.env
        cc = internal["env_curriculum_coeff"][:, None]
        keys = jax.random.split(key, 5)

        def add(obs, idx, scale, k):
            if len(idx) == 0 or scale == 0.0:
                return obs
            noise = cc * jax.random.uniform(
                k, (obs.shape[0], len(idx)), minval=-scale, maxval=scale
            )
            return obs.at[:, idx].add(noise)

        observation = add(observation, env.joint_positions_obs_idx, self.cfg["joint_position"], keys[0])
        observation = add(observation, env.joint_velocities_obs_idx, self.cfg["joint_velocity"], keys[1])
        observation = add(observation, env.imu_angular_vel_obs_idx, self.cfg["imu_angular_velocity"], keys[2])
        observation = add(observation, env.gravity_vector_obs_idx, self.cfg["gravity_vector"], keys[3])
        observation = add(observation, env.policy_exteroception_obs_idx, self.cfg["exteroception"], keys[4])
        return observation


class NoneObservationNoise:
    def __init__(self, env, cfg):
        pass

    def modify(self, internal, observation, key):
        return observation


# --- joint dropout --------------------------------------------------------------

class DefaultJointDropout:
    """Open (unpowered) / locked (frozen) actuator joints
    (`domain_randomization/joint_dropout_functions/default.py`; the lock is
    realized as servo-off + 1000x joint damping instead of a jnt_range clamp)."""

    LOCK_DAMPING = 1000.0

    def __init__(self, env, cfg):
        self.env = env
        self.open_chance = cfg["dropout_open_chance"]
        self.lock_chance = cfg["dropout_lock_chance"]

    def init_state(self, nr_envs):
        nu = self.env.nr_actuator_joints
        return {
            "joint_dropout_open": jnp.ones((nr_envs, nu), bool),   # True = powered
            "joint_dropout_lock": jnp.ones((nr_envs, nu), bool),   # True = movable
        }

    def sample(self, internal, should, key, curriculum_coeff):
        open_key, lock_key = jax.random.split(key)
        shape = internal["joint_dropout_open"].shape
        cc = curriculum_coeff[:, None]
        new_open = jax.random.uniform(open_key, shape) > cc * self.open_chance
        new_lock = jax.random.uniform(lock_key, shape) > cc * self.lock_chance
        internal = dict(internal)
        internal["joint_dropout_open"] = _where(should, new_open, internal["joint_dropout_open"])
        internal["joint_dropout_lock"] = _where(should, new_lock, internal["joint_dropout_lock"])
        return internal

    def kp_mask(self, internal):
        """[B, nu] multiplier on servo gains (0 = open or locked)."""
        powered = internal["joint_dropout_open"] & internal["joint_dropout_lock"]
        return powered.astype(jnp.float32)

    def damping_mask(self, internal):
        """[B, nu] extra joint damping factor (LOCK_DAMPING on locked joints)."""
        locked = ~internal["joint_dropout_lock"]
        return jnp.where(locked, self.LOCK_DAMPING, 1.0)

    def mask(self, internal):
        """[B, nu] bool: joint operating normally (reference's joint_dropout_mask)."""
        return internal["joint_dropout_open"] & internal["joint_dropout_lock"]


class NoneJointDropout(DefaultJointDropout):
    def __init__(self, env, cfg):
        self.env = env
        self.open_chance = 0.0
        self.lock_chance = 0.0

    def sample(self, internal, should, key, curriculum_coeff):
        return internal


# --- mujoco model (contact/gravity) DR -------------------------------------------

class DefaultModelDR:
    """Contact friction/stiffness + gravity randomization
    (`domain_randomization/mujoco_model_functions/default.py` equivalents
    for the penalty-contact engine)."""

    def __init__(self, env, cfg):
        self.env = env
        self.friction_factor = cfg["friction_tangential_factor"]
        self.timeconst_log_range = cfg["timeconst_log_range"]
        self.xy_gravity = cfg["xy_gravity"]
        self.z_gravity_factor = cfg["z_gravity_factor"]

    def init_state(self, nr_envs):
        g = float(-self.env.model.gravity[2])
        return {
            "dr_friction_scale": jnp.ones(nr_envs),
            "dr_contact_stiffness_scale": jnp.ones(nr_envs),
            "dr_gravity": jnp.tile(jnp.asarray([0.0, 0.0, -g]), (nr_envs, 1)),
        }

    def sample(self, internal, should, key, curriculum_coeff):
        B = should.shape[0]
        cc = curriculum_coeff
        k1, k2, k3, k4 = jax.random.split(key, 4)
        friction = jnp.exp(
            cc * jax.random.uniform(k1, (B,), minval=-1.0, maxval=1.0)
            * np.log(1.0 + self.friction_factor)
        )
        stiffness = jnp.exp(
            cc * jax.random.uniform(k2, (B,), minval=-0.5, maxval=0.5) * self.timeconst_log_range
        ) ** 0.5  # omega scale = 1/sqrt(timeconst scale)
        g = float(-self.env.model.gravity[2])
        gxy = cc[:, None] * jax.random.uniform(k3, (B, 2), minval=-self.xy_gravity, maxval=self.xy_gravity)
        gz = -g * (1.0 + cc * jax.random.uniform(k4, (B,), minval=-self.z_gravity_factor, maxval=self.z_gravity_factor))
        gravity = jnp.concatenate([gxy, gz[:, None]], axis=1)
        internal = dict(internal)
        internal["dr_friction_scale"] = jnp.where(should, friction, internal["dr_friction_scale"])
        internal["dr_contact_stiffness_scale"] = jnp.where(should, stiffness, internal["dr_contact_stiffness_scale"])
        internal["dr_gravity"] = _where(should, gravity, internal["dr_gravity"])
        return internal


class NoneModelDR(DefaultModelDR):
    def __init__(self, env, cfg):
        self.env = env

    def sample(self, internal, should, key, curriculum_coeff):
        return internal


# --- perturbations -----------------------------------------------------------------

class DefaultPerturbation:
    """Velocity kicks / joint nudges during episodes
    (`domain_randomization/perturbation_functions/default.py`)."""

    def __init__(self, env, cfg):
        self.env = env
        self.trunk_velocity_clip_mass_factor = cfg["trunk_velocity_clip_mass_factor"]
        self.trunk_velocity_clip_limit = cfg["trunk_velocity_clip_limit"]
        self.trunk_velocity_add_chance = cfg["trunk_velocity_add_chance"]
        self.max_joint_velocity = cfg["max_joint_velocity"]
        self.max_joint_position = cfg["max_joint_position"]

    def sample(self, qpos, qvel, internal, should, key):
        env = self.env
        B = should.shape[0]
        cc = internal["env_curriculum_coeff"]
        k1, k2, k3, k4 = jax.random.split(key, 4)

        max_v = min(
            float(env.total_mass) * self.trunk_velocity_clip_mass_factor,
            self.trunk_velocity_clip_limit,
        )
        kick = cc[:, None] * jax.random.uniform(k1, (B, 6), minval=-max_v, maxval=max_v)
        additive = jax.random.uniform(k2, (B,)) < self.trunk_velocity_add_chance
        trunk_v = jnp.where(
            additive[:, None],
            qvel[:, :6] + kick,
            kick * cc[:, None] + qvel[:, :6] * (1.0 - cc[:, None]),
        )
        trunk_v = jnp.where(should[:, None], trunk_v, qvel[:, :6])

        joint_v = qvel[:, 6:] + cc[:, None] * jax.random.uniform(
            k3, qvel[:, 6:].shape, minval=-self.max_joint_velocity, maxval=self.max_joint_velocity
        )
        joint_v = jnp.where(should[:, None], joint_v, qvel[:, 6:])
        joint_p = qpos[:, 7:] + cc[:, None] * jax.random.uniform(
            k4, qpos[:, 7:].shape, minval=-self.max_joint_position, maxval=self.max_joint_position
        )
        joint_p = jnp.where(should[:, None], joint_p, qpos[:, 7:])

        qpos = jnp.concatenate([qpos[:, :7], joint_p], axis=1)
        qvel = jnp.concatenate([trunk_v, joint_v], axis=1)
        return qpos, qvel


class NonePerturbation(DefaultPerturbation):
    def __init__(self, env, cfg):
        self.env = env

    def sample(self, qpos, qvel, internal, should, key):
        return qpos, qvel


# --- seen robot -----------------------------------------------------------------------

class DefaultSeenRobot:
    """Robot-parameter randomization the controller/observations track
    (`domain_randomization/seen_robot_functions/default.py`)."""

    def __init__(self, env, cfg):
        self.env = env
        self.mass_factor = cfg["coupled_mass_inertia_factor"]
        self.decoupled_mass_factor = cfg["decoupled_mass_inertia_factor"]
        self.p_gain_factor = cfg["p_gain_factor"]
        self.d_gain_factor = cfg["d_gain_factor"]
        self.torque_limit_factor = cfg["torque_limit_factor"]
        self.add_nominal = cfg["add_actuator_joint_nominal_position"]
        self.joint_velocity_max_factor = cfg["joint_velocity_max_factor"]
        self.add_joint_range = cfg["add_joint_range"]
        self.joint_damping_factor = cfg["joint_damping_factor"]
        self.joint_armature_factor = cfg["joint_armature_factor"]
        self.joint_friction_loss_factor = cfg["joint_friction_loss_factor"]
        self.scaling_factor_factor = cfg["scaling_factor_factor"]

    def init_state(self, nr_envs):
        env = self.env
        nu = env.nr_actuator_joints
        return {
            "actuator_joint_nominal_positions": jnp.tile(env.nominal_joint_positions, (nr_envs, 1)),
            "actuator_joint_max_velocities": jnp.tile(env.max_joint_velocities, (nr_envs, 1)),
            "joint_position_limits": jnp.tile(env.soft_joint_limits[None], (nr_envs, 1, 1)),
            "scaling_factor": jnp.full(nr_envs, env.robot_config["scaling_factor"]),
            "seen_mass_scale": jnp.ones((nr_envs, env.model.nbody)),
            "seen_kp_scale": jnp.ones((nr_envs, nu)),
            "seen_kv_scale": jnp.ones((nr_envs, nu)),
            "seen_forcerange_scale": jnp.ones((nr_envs, nu)),
            "seen_damping_scale": jnp.ones(nr_envs),
            "seen_armature_scale": jnp.ones(nr_envs),
            "seen_frictionloss_scale": jnp.ones(nr_envs),
        }

    def sample(self, internal, should, key, curriculum_coeff):
        env = self.env
        B = should.shape[0]
        nu = env.nr_actuator_joints
        cc = curriculum_coeff[:, None]
        keys = jax.random.split(key, 11)
        u = lambda k, shape, f: 1.0 + cc * jax.random.uniform(k, shape, minval=-f, maxval=f)

        coupled = u(keys[0], (B, 1), self.mass_factor)
        decoupled = u(keys[1], (B, env.model.nbody), self.decoupled_mass_factor)
        new = {
            "seen_mass_scale": coupled * decoupled,
            "seen_kp_scale": u(keys[2], (B, nu), self.p_gain_factor),
            "seen_kv_scale": u(keys[3], (B, nu), self.d_gain_factor),
            "seen_forcerange_scale": u(keys[4], (B, nu), self.torque_limit_factor),
            "seen_damping_scale": u(keys[5], (B, 1), self.joint_damping_factor)[:, 0],
            "seen_armature_scale": u(keys[6], (B, 1), self.joint_armature_factor)[:, 0],
            "seen_frictionloss_scale": u(keys[7], (B, 1), self.joint_friction_loss_factor)[:, 0],
            "actuator_joint_nominal_positions": env.nominal_joint_positions[None]
            + cc * jax.random.uniform(keys[8], (B, nu), minval=-self.add_nominal, maxval=self.add_nominal),
            "actuator_joint_max_velocities": env.max_joint_velocities[None]
            * u(keys[9], (B, nu), self.joint_velocity_max_factor),
            "scaling_factor": env.robot_config["scaling_factor"]
            * u(keys[10], (B, 1), self.scaling_factor_factor)[:, 0],
        }
        internal = dict(internal)
        for name, value in new.items():
            internal[name] = _where(should, value, internal[name])
        return internal


class NoneSeenRobot(DefaultSeenRobot):
    def __init__(self, env, cfg):
        self.env = env

    def sample(self, internal, should, key, curriculum_coeff):
        return internal


# --- unseen robot -----------------------------------------------------------------------

class DefaultUnseenRobot:
    """Hidden dynamics randomization (`domain_randomization/
    unseen_robot_functions/default.py`): the controller keeps commanding the
    seen nominal, but the servo zero / gains / masses differ."""

    def __init__(self, env, cfg):
        self.env = env
        self.mass_factor = cfg["mass_inertia_factor"]
        self.p_gain_factor = cfg["p_gain_factor"]
        self.d_gain_factor = cfg["d_gain_factor"]
        self.damping_factor = cfg["joint_damping_factor"]
        self.position_offset = cfg["position_offset"]

    def init_state(self, nr_envs):
        env = self.env
        nu = env.nr_actuator_joints
        return {
            "position_offsets": jnp.zeros((nr_envs, nu)),
            "unseen_mass_scale": jnp.ones((nr_envs, env.model.nbody)),
            "unseen_kp_scale": jnp.ones((nr_envs, nu)),
            "unseen_kv_scale": jnp.ones((nr_envs, nu)),
            "unseen_damping_scale": jnp.ones(nr_envs),
        }

    def sample(self, internal, should, key, curriculum_coeff):
        env = self.env
        B = should.shape[0]
        nu = env.nr_actuator_joints
        cc = curriculum_coeff[:, None]
        keys = jax.random.split(key, 5)
        u = lambda k, shape, f: 1.0 + cc * jax.random.uniform(k, shape, minval=-f, maxval=f)
        new = {
            "position_offsets": cc * jax.random.uniform(
                keys[0], (B, nu), minval=-self.position_offset, maxval=self.position_offset
            ),
            "unseen_mass_scale": u(keys[1], (B, env.model.nbody), self.mass_factor),
            "unseen_kp_scale": u(keys[2], (B, nu), self.p_gain_factor),
            "unseen_kv_scale": u(keys[3], (B, nu), self.d_gain_factor),
            "unseen_damping_scale": u(keys[4], (B, 1), self.damping_factor)[:, 0],
        }
        internal = dict(internal)
        for name, value in new.items():
            internal[name] = _where(should, value, internal[name])
        return internal


class NoneUnseenRobot(DefaultUnseenRobot):
    def __init__(self, env, cfg):
        self.env = env

    def sample(self, internal, should, key, curriculum_coeff):
        return internal


_REGISTRIES = {
    "action_delay": {"default": DefaultActionDelay, "none": NoneActionDelay},
    "initial_state": {"random": RandomInitialState, "nominal": NominalInitialState},
    "observation_noise": {"default": DefaultObservationNoise, "none": NoneObservationNoise},
    "joint_dropout": {"default": DefaultJointDropout, "none": NoneJointDropout},
    "mujoco_model": {"default": DefaultModelDR, "none": NoneModelDR},
    "perturbation": {"default": DefaultPerturbation, "none": NonePerturbation},
    "seen_robot": {"default": DefaultSeenRobot, "none": NoneSeenRobot},
    "unseen_robot": {"default": DefaultUnseenRobot, "none": NoneUnseenRobot},
}


def get_domain_randomization_function(axis, name, env, cfg):
    return _REGISTRIES[axis][name](env, cfg)
