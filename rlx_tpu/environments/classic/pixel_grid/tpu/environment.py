"""PixelGrid: a device-resident IMAGE-observation environment.

Exercises the IMAGES observation path (NatureCNN critics of the DQN family,
`rl_x/algorithms/dqn/flax/critic.py:20-33`) without external Atari deps
(ale_py is unavailable in this image): the agent moves on an N x N grid
rendered as an 84x84x1 image (agent bright, goal mid-gray) and must reach
the goal (+1, terminate); each step costs -0.01.

Everything is batched pure JAX: rendering is a scatter of two cells into a
zero canvas, upscaled by pixel replication — trivially cheap on the VPU.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlx_tpu.environments.env import DeviceEnv
from rlx_tpu.environments.spaces import BoxSpace, DiscreteSpace


class GridPhysics(NamedTuple):
    agent: jax.Array  # [B, 2] int32 (row, col)
    goal: jax.Array   # [B, 2] int32


class PixelGrid(DeviceEnv):
    grid_size = 8
    image_size = 84  # NatureCNN's canonical input

    def __init__(self, nr_envs, horizon=64):
        self.nr_envs = nr_envs
        self.horizon = horizon
        self.cell = self.image_size // self.grid_size  # pixels per cell
        self.single_observation_space = BoxSpace(
            low=0.0, high=255.0, shape=(self.image_size, self.image_size, 1)
        )
        self.single_action_space = DiscreteSpace(4)  # up, down, left, right

    def initial_physics(self, key, eval_mode):
        agent_key, goal_key = jax.random.split(key)
        agent = jax.random.randint(agent_key, (self.nr_envs, 2), 0, self.grid_size)
        goal = jax.random.randint(goal_key, (self.nr_envs, 2), 0, self.grid_size)
        # if spawned on the goal, shift the goal by one cell (wrapping)
        same = jnp.all(agent == goal, axis=-1)
        goal = goal.at[:, 0].set(jnp.where(same, (goal[:, 0] + 1) % self.grid_size, goal[:, 0]))
        return GridPhysics(agent=agent, goal=goal)

    def observe(self, physics):
        B = physics.agent.shape[0]
        n = self.grid_size
        grid = jnp.zeros((B, n, n))
        idx = jnp.arange(B)
        grid = grid.at[idx, physics.goal[:, 0], physics.goal[:, 1]].set(128.0)
        grid = grid.at[idx, physics.agent[:, 0], physics.agent[:, 1]].set(255.0)
        image = jnp.repeat(jnp.repeat(grid, self.cell, axis=1), self.cell, axis=2)
        # pad 8x*10=80 -> 84 canvas
        pad = self.image_size - n * self.cell
        image = jnp.pad(image, ((0, 0), (0, pad), (0, pad)))
        return image[..., None]

    def transition(self, physics, action, key):
        moves = jnp.array([[-1, 0], [1, 0], [0, -1], [0, 1]])
        agent = jnp.clip(physics.agent + moves[action], 0, self.grid_size - 1)
        reached = jnp.all(agent == physics.goal, axis=-1)
        reward = jnp.where(reached, 1.0, -0.01)
        new_physics = GridPhysics(agent=agent, goal=physics.goal)
        return new_physics, reward, reached, {}
