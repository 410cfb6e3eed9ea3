"""PixelChase: a frame-stack-REQUIRING device-resident image environment.

The Atari-shaped stand-in for BASELINE config 4 while ale_py is absent
(the reference's DQN family is images+discrete ONLY,
`rl_x/algorithms/dqn/flax/general_properties.py:8-9`, with the SB3 Atari
stack's 4-frame motion perception).  Unlike PixelGrid (static goal — a
single frame is a sufficient statistic), here the goal DRIFTS one cell
every ``goal_period`` steps in a per-episode random cardinal direction,
WRAPPING at the edges while the agent is clipped.  At the default
``goal_period=1`` the goal moves at the agent's own speed, so pure
pursuit (walk toward the goal's current cell) never closes the torus
distance — catching requires INTERCEPTION, i.e. leading the goal's
trajectory, and the drift direction is only observable across >= 2
frames.  The 84x84x4 stack carries real information exactly the way
Atari frame stacks do; measured on one v5e chip (400k steps, identical
recipe): frame_stack=4 reaches 0.88 return, frame_stack=1 caps at 0.43
(benchmarks/results/pixel_chase_dqn*.json).

Observation: [84, 84, frame_stack] float32 in [0, 255]; newest frame LAST
(SB3 FrameStack channel order).  Agent bright (255), goal mid-gray (128).
Rendering is a batched scatter + pixel-replication upscale — trivial VPU
work, so the NatureCNN forward dominates (what a conv-net benchmark
should measure).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlx_tpu.environments.env import DeviceEnv
from rlx_tpu.environments.spaces import BoxSpace, DiscreteSpace


class ChasePhysics(NamedTuple):
    agent: jax.Array      # [B, 2] int32 (row, col)
    goal: jax.Array       # [B, 2] int32
    direction: jax.Array  # [B] int32 index into the 4 cardinal moves
    step: jax.Array       # [B] int32 steps since episode start
    frames: jax.Array     # [B, H, W, frame_stack] uint8 rolling stack


_MOVES = jnp.array([[-1, 0], [1, 0], [0, -1], [0, 1]], jnp.int32)


class PixelChase(DeviceEnv):
    grid_size = 8
    image_size = 84  # NatureCNN's canonical input

    def __init__(self, nr_envs, horizon=64, frame_stack=4, goal_period=1):
        self.nr_envs = nr_envs
        self.horizon = horizon
        self.frame_stack = frame_stack
        self.goal_period = goal_period
        self.cell = self.image_size // self.grid_size
        self.single_observation_space = BoxSpace(
            low=0.0, high=255.0,
            shape=(self.image_size, self.image_size, frame_stack),
        )
        self.single_action_space = DiscreteSpace(4)

    def _render_frame(self, agent, goal):
        """[B, 2] x2 -> [B, H, W] uint8 frame."""
        B = agent.shape[0]
        n = self.grid_size
        grid = jnp.zeros((B, n, n), jnp.uint8)
        idx = jnp.arange(B)
        grid = grid.at[idx, goal[:, 0], goal[:, 1]].set(128)
        grid = grid.at[idx, agent[:, 0], agent[:, 1]].set(255)
        image = jnp.repeat(jnp.repeat(grid, self.cell, axis=1), self.cell, axis=2)
        pad = self.image_size - n * self.cell
        return jnp.pad(image, ((0, 0), (0, pad), (0, pad)))

    def initial_physics(self, key, eval_mode):
        agent_key, goal_key, dir_key = jax.random.split(key, 3)
        agent = jax.random.randint(agent_key, (self.nr_envs, 2), 0, self.grid_size)
        goal = jax.random.randint(goal_key, (self.nr_envs, 2), 0, self.grid_size)
        same = jnp.all(agent == goal, axis=-1)
        goal = goal.at[:, 0].set(jnp.where(same, (goal[:, 0] + 1) % self.grid_size, goal[:, 0]))
        direction = jax.random.randint(dir_key, (self.nr_envs,), 0, 4)
        frame = self._render_frame(agent, goal)  # [B, H, W]
        # fresh episode: the stack is the initial frame repeated (SB3 reset)
        frames = jnp.repeat(frame[..., None], self.frame_stack, axis=-1)
        return ChasePhysics(
            agent=agent, goal=goal, direction=direction,
            step=jnp.zeros((self.nr_envs,), jnp.int32), frames=frames,
        )

    def observe(self, physics):
        return physics.frames.astype(jnp.float32)

    def transition(self, physics, action, key):
        agent = jnp.clip(physics.agent + _MOVES[action], 0, self.grid_size - 1)
        step = physics.step + 1
        goal_moves = (step % self.goal_period == 0)
        goal = jnp.where(
            goal_moves[:, None],
            (physics.goal + _MOVES[physics.direction]) % self.grid_size,
            physics.goal,
        )
        caught = jnp.all(agent == goal, axis=-1)
        reward = jnp.where(caught, 1.0, -0.01)
        frame = self._render_frame(agent, goal)
        frames = jnp.concatenate(
            [physics.frames[..., 1:], frame[..., None]], axis=-1
        )
        new_physics = ChasePhysics(
            agent=agent, goal=goal, direction=physics.direction,
            step=step, frames=frames,
        )
        return new_physics, reward, caught, {}
