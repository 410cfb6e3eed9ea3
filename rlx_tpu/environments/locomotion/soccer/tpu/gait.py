"""Sinusoidal gait-phase manager, batched over the env axis.

Re-implements the reference's per-env gait manager
(`robocup_soccer/locomotion/mjx/gait_manager_functions/default.py:5-57`)
as ``[B, ...]`` state inside the env's internal dict: two anti-phase foot
oscillators advancing by ``2*pi*dt*freq`` per control step.  The phase read
by both the observation features and the phase reward is the NEXT step's
phase (``phase + phase_dt``), matching the reference's
``get_phase_features`` / ``get_phase_for_reward`` lookahead; a standing
command pins the reward phase to ``pi`` (both feet expected on the ground).
"""

import jax
import jax.numpy as jnp


def wrap_to_pi(x):
    return (x + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


class GaitManager:
    STAND_PHASE = jnp.pi

    def __init__(self, env, cfg):
        self.env = env
        self.gait_period = cfg["gait_period"]
        self.width = cfg["gait_period_randomization_width"]
        self.mean_freq = 1.0 / self.gait_period

    def init_state(self, nr_envs):
        offsets = jnp.broadcast_to(jnp.asarray([0.0, -jnp.pi]), (nr_envs, 2))
        freq = jnp.full(nr_envs, self.mean_freq)
        return {
            "gait_phase": offsets,
            "gait_freq": freq,
            "gait_phase_dt": (2.0 * jnp.pi * self.env.dt) * freq,
        }

    def episode_start(self, internal, mask, key, eval_mode):
        """Masked per-episode resample: random phase offset + frequency,
        scaled by the curriculum; eval pins the canonical gait."""
        B = mask.shape[0]
        cc = internal["env_curriculum_coeff"]
        phase_key, freq_key = jax.random.split(key)

        phase0 = cc * jax.random.uniform(phase_key, (B,), minval=-jnp.pi, maxval=jnp.pi)
        offsets = jnp.stack([phase0, wrap_to_pi(phase0 + jnp.pi)], axis=1)
        if eval_mode:
            offsets = jnp.broadcast_to(jnp.asarray([0.0, -jnp.pi]), (B, 2))

        low = self.mean_freq - cc * self.width
        high = self.mean_freq + cc * self.width
        freq = jax.random.uniform(freq_key, (B,), minval=0.0, maxval=1.0) * (high - low) + low
        if eval_mode:
            freq = jnp.full(B, self.mean_freq)

        internal = dict(internal)
        internal["gait_phase"] = jnp.where(mask[:, None], offsets, internal["gait_phase"])
        internal["gait_freq"] = jnp.where(mask, freq, internal["gait_freq"])
        internal["gait_phase_dt"] = (2.0 * jnp.pi * self.env.dt) * internal["gait_freq"]
        return internal

    def phase_features(self, internal):
        """[B, 4] sin/cos of the next step's two foot phases."""
        phase_tp1 = wrap_to_pi(internal["gait_phase"] + internal["gait_phase_dt"][:, None])
        return jnp.concatenate([jnp.sin(phase_tp1), jnp.cos(phase_tp1)], axis=-1)

    def phase_for_reward(self, internal):
        """[B, 2]; standing command pins the stand phase (both feet down)."""
        phase_tp1 = wrap_to_pi(internal["gait_phase"] + internal["gait_phase_dt"][:, None])
        standing = jnp.all(internal["goal_velocities"] == 0.0, axis=1)
        return jnp.where(standing[:, None], self.STAND_PHASE, phase_tp1)

    def step(self, internal):
        internal = dict(internal)
        internal["gait_phase"] = wrap_to_pi(
            internal["gait_phase"] + internal["gait_phase_dt"][:, None]
        )
        return internal
