"""SimBa: simplicity-bias scaled networks over SAC.

Parity with `rl_x/algorithms/simba/flax/simba.py` + `layers.py:6-43`:
pre-LN residual-block encoders for policy and critics, tanh-bounded
state-dependent log-std head; everything else is the SAC fused program.
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import orthogonal

from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.algorithms.simba.tpu.general_properties import GeneralProperties
from rlx_tpu.models.layers import SimbaEncoder


class SimbaPolicy(nn.Module):
    action_dim: int
    hidden_dim: int
    nr_blocks: int
    log_std_min: float = -10.0
    log_std_max: float = 2.0
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, x):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        x = SimbaEncoder(self.hidden_dim, self.nr_blocks)(x)
        mean = nn.Dense(self.action_dim, kernel_init=orthogonal(1.0))(x)
        log_std = nn.Dense(self.action_dim, kernel_init=orthogonal(1.0))(x)
        log_std = self.log_std_min + (self.log_std_max - self.log_std_min) * 0.5 * (
            1.0 + jnp.tanh(log_std)
        )
        return mean, log_std


class SimbaCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        x = SimbaEncoder(self.hidden_dim, self.nr_blocks)(x)
        return nn.Dense(1, kernel_init=orthogonal(1.0))(x)


class SimbaVectorCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_critics: int = 2
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        ensemble = nn.vmap(
            SimbaCritic,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(self.hidden_dim, self.nr_blocks, self.observation_indices)(obs, action)


class SimBa(SAC):
    def _build_policy(self, a):
        return SimbaPolicy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            nr_blocks=a.policy_nr_blocks,
            log_std_min=a.log_std_min,
            log_std_max=a.log_std_max,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def _build_critic(self, a):
        return SimbaVectorCritic(
            hidden_dim=a.critic_hidden_dim,
            nr_blocks=a.critic_nr_blocks,
            nr_critics=a.nr_critics,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def general_properties():
        return GeneralProperties
