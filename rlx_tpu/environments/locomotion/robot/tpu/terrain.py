"""Terrain functions: plane and per-env diverse heightfields (batched).

Re-cut of `rl_x/environments/custom_mujoco/robot_locomotion/mjx/
terrain_functions/{plane,hfield_diverse}.py` for the batched-native env: the
reference swaps ``hfield_data`` inside a per-env mjx model; here each env
carries a ``[n*n]`` height grid row in the physics state and the engine's
penalty contacts query it directly (`rlx_tpu/physics/engine.py` Terrain).

The diverse generator reproduces the reference recipe
(`hfield_diverse.py:118-140`): two axis-aligned sine waves with random
frequency, uniform per-cell roughness, and two layers of random blocks —
all scaled by the env's curriculum coefficient.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.physics.engine import Terrain


class PlaneTerrain:
    """Flat ground at z=0; no per-env state."""

    n = 1
    # effectively unbounded: the plane has no grid edge, so the hfield
    # edge-teleport in LocomotionEnv.step must never trigger
    half_extent_m = 1e9

    def __init__(self, env, cfg):
        self.env = env

    def init_state(self, nr_envs):
        return {}

    def sample(self, internal, key, curriculum_coeff):
        return internal

    def engine_terrain(self, internal):
        return None

    def height_at(self, internal, x, y):
        """x, y [B, K] world meters -> ground height [B, K]."""
        return jnp.zeros_like(x)

    def center_height(self, internal):
        return None  # zero; callers treat None as 0.0


class HFieldDiverseTerrain:
    def __init__(self, env, cfg):
        self.env = env
        self.n = int(cfg.get("grid_cells", 64))
        self.half_extent_m = float(cfg.get("half_extent_m", 4.0))
        self.wave_fn_min = cfg["wave_fn_min"]
        self.wave_fn_max = cfg["wave_fn_max"]
        self.wave_height_max = cfg["wave_height_max_per_m_factor"] * env.robot_dimensions_mean
        self.random_height_max = cfg["random_height_max_per_m_factor"] * env.robot_dimensions_mean
        self.block_probability = cfg["block_probability"]
        self.block_length_in_meters = cfg["block_length_in_meters"]
        self.block_height_max = cfg["block_height_max_per_m_factor"] * env.robot_dimensions_mean
        self.cells_per_m = self.n / (2.0 * self.half_extent_m)

    def init_state(self, nr_envs):
        return {"terrain_height": jnp.zeros((nr_envs, self.n * self.n))}

    def sample(self, internal, key, curriculum_coeff):
        """Fresh per-env heightfields; [B] curriculum scales all amplitudes."""
        B = curriculum_coeff.shape[0]
        n = self.n
        keys = jax.random.split(key, 6)

        wave_height = curriculum_coeff * jax.random.uniform(keys[0], (B,), maxval=self.wave_height_max)
        random_height = curriculum_coeff * jax.random.uniform(keys[1], (B,), maxval=self.random_height_max)
        block_height = curriculum_coeff * jax.random.uniform(keys[2], (B,), maxval=self.block_height_max)

        I = np.arange(n, dtype=np.float32)[:, None] * np.ones((1, n), np.float32)
        J = I.T
        f1 = jax.random.uniform(keys[3], (B, 1, 1), minval=self.wave_fn_min, maxval=self.wave_fn_max)
        f2 = jax.random.uniform(keys[4], (B, 1, 1), minval=self.wave_fn_min, maxval=self.wave_fn_max)
        wave = jnp.sin(2 * jnp.pi * f1 * I[None] / n) + jnp.sin(2 * jnp.pi * f2 * J[None] / n)
        hf = wave_height[:, None, None] * wave

        noise_key, block_key1, block_key2 = jax.random.split(keys[5], 3)
        hf = hf + jax.random.uniform(
            noise_key, (B, n, n), minval=-1.0, maxval=1.0
        ) * random_height[:, None, None]

        # blocks: coarse bernoulli grid upsampled by repetition (two layers,
        # matching the reference's repeat-then-transpose construction)
        block_cells = max(int(self.block_length_in_meters * self.cells_per_m), 1)
        nb = max(n // block_cells, 1)
        blocks1 = jax.random.bernoulli(block_key1, self.block_probability, (B, nb, nb))
        blocks2 = jax.random.bernoulli(block_key2, self.block_probability, (B, nb, nb))
        up = lambda b: jnp.repeat(jnp.repeat(b, block_cells, axis=1), block_cells, axis=2)[:, :n, :n]
        hf = hf + up(blocks1).astype(jnp.float32) * block_height[:, None, None]
        hf = hf + up(blocks2).astype(jnp.float32).transpose(0, 2, 1) * block_height[:, None, None]

        # shift so the minimum is 0 (mujoco hfield convention,
        # `hfield_diverse.py:113-116`)
        hf = hf - hf.min(axis=(1, 2), keepdims=True)
        internal = dict(internal)
        internal["terrain_height"] = hf.reshape(B, n * n)
        return internal

    def engine_terrain(self, internal):
        return Terrain(
            height=internal["terrain_height"].T, n=self.n, half_extent_m=self.half_extent_m
        )

    def height_at(self, internal, x, y):
        """x, y [B, K] -> heights [B, K] (nearest cell, clipped to the grid)."""
        n = self.n
        ix = jnp.clip(jnp.round(x * self.cells_per_m + n // 2).astype(jnp.int32), 0, n - 1)
        iy = jnp.clip(jnp.round(y * self.cells_per_m + n // 2).astype(jnp.int32), 0, n - 1)
        flat = iy * n + ix                                        # [B, K]
        return jnp.take_along_axis(internal["terrain_height"], flat, axis=1)

    def center_height(self, internal):
        n = self.n
        return internal["terrain_height"][:, (n // 2) * n + n // 2]


TERRAIN_FUNCTIONS = {
    "plane": PlaneTerrain,
    "hfield_diverse": HFieldDiverseTerrain,
}


def get_terrain_function(name, env, cfg):
    return TERRAIN_FUNCTIONS[name](env, cfg)
