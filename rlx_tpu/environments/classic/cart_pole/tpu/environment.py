"""Batched pure-JAX CartPole, dynamics-equivalent to Gymnasium CartPole-v1.

Device-resident counterpart of `rl_x/environments/gym/classic/cart_pole_v1/`
(which steps Gymnasium on host).  Discrete 2-action control; exercises the
DISCRETE action path of PPO and the DQN family.

Physics (Barto-Sutton cart-pole, Euler, dt=0.02):
  temp      = (F + m_p l thdot^2 sin th) / (m_c + m_p)
  thacc     = (g sin th - cos th temp) / (l (4/3 - m_p cos^2 th / (m_c+m_p)))
  xacc      = temp - m_p l thacc cos th / (m_c + m_p)
termination: |x| > 2.4 or |theta| > 12 deg; reward 1 per step; horizon 500.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlx_tpu.environments.env import DeviceEnv
from rlx_tpu.environments.spaces import BoxSpace, DiscreteSpace


class CartPolePhysics(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array


class CartPole(DeviceEnv):
    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    length = 0.5  # half pole length
    force_mag = 10.0
    dt = 0.02
    theta_threshold = 12.0 * 2.0 * jnp.pi / 360.0
    x_threshold = 2.4

    def __init__(self, nr_envs, horizon=500):
        self.nr_envs = nr_envs
        self.horizon = horizon
        high = jnp.array([4.8, jnp.inf, 0.42, jnp.inf])
        self.single_observation_space = BoxSpace(low=-high, high=high, shape=(4,))
        self.single_action_space = DiscreteSpace(2)

    def initial_physics(self, key, eval_mode):
        vals = jax.random.uniform(key, (self.nr_envs, 4), minval=-0.05, maxval=0.05)
        return CartPolePhysics(vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3])

    def observe(self, physics):
        return jnp.stack([physics.x, physics.x_dot, physics.theta, physics.theta_dot], axis=-1)

    def transition(self, physics, action, key):
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        x, x_dot, theta, theta_dot = physics
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length

        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        temp = (force + polemass_length * theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.gravity * sin_t - cos_t * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * cos_t**2 / total_mass)
        )
        x_acc = temp - polemass_length * theta_acc * cos_t / total_mass

        x = x + self.dt * x_dot
        x_dot = x_dot + self.dt * x_acc
        theta = theta + self.dt * theta_dot
        theta_dot = theta_dot + self.dt * theta_acc

        new_physics = CartPolePhysics(x, x_dot, theta, theta_dot)
        terminated = (jnp.abs(x) > self.x_threshold) | (jnp.abs(theta) > self.theta_threshold)
        reward = jnp.ones(self.nr_envs)
        return new_physics, reward, terminated, {}
