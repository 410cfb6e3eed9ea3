"""SimbaV2: hypersphere-normalized networks over SAC.

Parity with `rl_x/algorithms/simbav2/flax/simbav2.py` + `layers.py:16-114` +
`normalizer.py:4-60`: Scaler/HyperDense/HyperLERP blocks (weights and
activations kept on the unit sphere), categorical (HL-Gauss) value head,
Welford observation normalizer and discounted-return reward normalizer.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from rlx_tpu.algorithms.simbav2.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.xqc.tpu.xqc import XQC
from rlx_tpu.models.layers import HyperHead, SimbaV2Encoder
from rlx_tpu.ops import normalizers


class SimbaV2Policy(nn.Module):
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
        x = SimbaV2Encoder(self.hidden_dim, self.nr_blocks)(x)
        mean = HyperHead(self.hidden_dim, self.action_dim)(x)
        log_std = HyperHead(self.hidden_dim, self.action_dim)(x)
        log_std = self.log_std_min + (self.log_std_max - self.log_std_min) * 0.5 * (
            1.0 + jnp.tanh(log_std)
        )
        return mean, log_std


class SimbaV2Critic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_atoms: int
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        x = SimbaV2Encoder(self.hidden_dim, self.nr_blocks)(x)
        return HyperHead(self.hidden_dim, self.nr_atoms)(x)


class SimbaV2VectorCritic(nn.Module):
    hidden_dim: int
    nr_blocks: int
    nr_atoms: int
    nr_critics: int = 2
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action):
        ensemble = nn.vmap(
            SimbaV2Critic,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(
            self.hidden_dim, self.nr_blocks, self.nr_atoms, self.observation_indices
        )(obs, action)


class SimbaV2(XQC):
    """XQC's HL-Gauss update with hypersphere nets + running normalizers."""

    def _build_policy(self, a):
        self.policy_delay = getattr(a, "policy_delay", 1)
        self.normalize_obs = a.enable_observation_normalization
        self.normalize_rewards = a.enable_reward_normalization
        return SimbaV2Policy(
            action_dim=self.action_dim,
            hidden_dim=a.policy_hidden_dim,
            nr_blocks=a.policy_nr_blocks,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def _build_critic(self, a):
        self.v_min, self.v_max = a.v_min, a.v_max
        self.nr_atoms = a.nr_atoms
        return SimbaV2VectorCritic(
            hidden_dim=a.critic_hidden_dim,
            nr_blocks=a.critic_nr_blocks,
            nr_atoms=a.nr_atoms,
            nr_critics=a.nr_critics,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def setup_states(self):
        states = super().setup_states()
        if self.normalize_obs:
            states["obs_normalizer"] = normalizers.obs_normalizer_init(self.os_shape)
        if self.normalize_rewards:
            states["reward_normalizer"] = normalizers.reward_normalizer_init(self.nr_envs)
        return states

    def _norm(self, states, observation):
        if self.normalize_obs:
            return normalizers.obs_normalize(states["obs_normalizer"], observation)
        return observation

    def observe_transition(self, states, observation, env_state):
        if not self.normalize_obs:
            return states
        return {**states, "obs_normalizer": normalizers.obs_normalizer_update(
            states["obs_normalizer"], observation)}

    def act(self, states, observation, key, step):
        return super().act(states, self._norm(states, observation), key, step)

    def eval_act(self, states, observation):
        return super().eval_act(states, self._norm(states, observation))

    def update(self, states, batch, key, step):
        batch = dict(batch)
        batch["observation"] = self._norm(states, batch["observation"])
        batch["next_observation"] = self._norm(states, batch["next_observation"])
        if self.normalize_rewards:
            batch["reward"] = normalizers.reward_normalize(
                states["reward_normalizer"], batch["reward"]
            )
        new_states, metrics = super().update(states, batch, key, step)
        return new_states, metrics

    def _learning_step(self, carry, step):
        # additionally advance the reward normalizer with the online stream
        (states, buffer, env_state, key), out = super()._learning_step(carry, step)
        if self.normalize_rewards:
            states = {**states, "reward_normalizer": normalizers.reward_normalizer_update(
                states["reward_normalizer"], env_state.reward,
                env_state.terminated, env_state.truncated, self.gamma,
            )}
        return (states, buffer, env_state, key), out

    def general_properties():
        return GeneralProperties
