"""Batched pure-JAX Pendulum, dynamics-equivalent to Gymnasium Pendulum-v1.

The reference runs Pendulum-class workloads through host Gymnasium
(`rl_x/environments/gym/classic/cart_pole_v1/`); here the swing-up task is a
device-resident env so the whole training run stays inside one XLA program.
Used as the CPU-runnable correctness benchmark (BASELINE.md config #1).

Physics (classic torque-limited swing-up):
  theta_dot' = theta_dot + (3 g / (2 l) sin(theta) + 3 / (m l^2) u) dt
  reward     = -(angle_norm(theta)^2 + 0.1 theta_dot^2 + 0.001 u^2)
with g=10, m=1, l=1, dt=0.05, |u|<=2, |theta_dot|<=8, 200-step horizon,
no termination (truncation-only => value bootstrap path is exercised).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlx_tpu.environments.env import DeviceEnv
from rlx_tpu.environments.spaces import BoxSpace


class PendulumPhysics(NamedTuple):
    theta: jax.Array
    theta_dot: jax.Array


class Pendulum(DeviceEnv):
    g = 10.0
    m = 1.0
    l = 1.0
    dt = 0.05
    max_speed = 8.0
    max_torque = 2.0

    def __init__(self, nr_envs, horizon=200):
        self.nr_envs = nr_envs
        self.horizon = horizon
        self.single_observation_space = BoxSpace(
            low=jnp.array([-1.0, -1.0, -self.max_speed]),
            high=jnp.array([1.0, 1.0, self.max_speed]),
            shape=(3,),
        )
        self.single_action_space = BoxSpace(
            low=-self.max_torque, high=self.max_torque, shape=(1,)
        )

    def initial_physics(self, key, eval_mode):
        theta_key, vel_key = jax.random.split(key)
        theta = jax.random.uniform(theta_key, (self.nr_envs,), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(vel_key, (self.nr_envs,), minval=-1.0, maxval=1.0)
        return PendulumPhysics(theta=theta, theta_dot=theta_dot)

    def observe(self, physics):
        return jnp.stack(
            [jnp.cos(physics.theta), jnp.sin(physics.theta), physics.theta_dot], axis=-1
        )

    def transition(self, physics, action, key):
        torque = jnp.clip(action[..., 0], -self.max_torque, self.max_torque)
        theta, theta_dot = physics.theta, physics.theta_dot

        angle = ((theta + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi
        cost = angle**2 + 0.1 * theta_dot**2 + 0.001 * torque**2

        new_theta_dot = theta_dot + (
            3.0 * self.g / (2.0 * self.l) * jnp.sin(theta)
            + 3.0 / (self.m * self.l**2) * torque
        ) * self.dt
        new_theta_dot = jnp.clip(new_theta_dot, -self.max_speed, self.max_speed)
        new_theta = theta + new_theta_dot * self.dt

        new_physics = PendulumPhysics(theta=new_theta, theta_dot=new_theta_dot)
        reward = -cost
        terminated = jnp.zeros(self.nr_envs, dtype=bool)
        return new_physics, reward, terminated, {}
