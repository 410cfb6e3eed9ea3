"""Recurrent policy for the memory suite (LSTM / GRU cells).

Architecture parity with `rl_x/algorithms/ppo_lstm/flax_full_jit/policy.py:33-143`
(obs encoder -> cell -> LayerNorm+elu -> concat/FiLM combine -> 512/256/128
torso -> mean head with state-independent logstd) and its GRU twin
(`ppo_gru/flax_full_jit/policy.py`).  One module covers both cells; the carry
is whatever the cell uses (LSTM tuple / GRU array), handled via tree maps.

Batched-native ``sequence``: the in-loss BPTT re-run is a single scan over
time with the env-minibatch batched inside each step (the reference vmaps a
per-env scan, `ppo_lstm.py:225` — same math, one scan instead of E).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from flax.linen.initializers import constant, orthogonal


class RecurrentPolicy(nn.Module):
    action_dim: int
    cell_type: str = "lstm"  # "lstm" | "gru"
    std_dev: float = 1.0
    obs_encoding_dim: int = 128
    hidden_dim: int = 64
    combine_method: str = "concat"  # "concat" | "film"
    share_encoder: bool = False
    observation_indices: Sequence[int] = None

    def setup(self):
        ortho = lambda g: orthogonal(g)
        self.cell_obs_encoder = nn.Dense(
            self.obs_encoding_dim, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0)
        )
        self.cell_obs_ln = nn.LayerNorm()
        if not self.share_encoder:
            self.obs_encoder = nn.Dense(
                self.obs_encoding_dim, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0)
            )
            self.obs_ln = nn.LayerNorm()

        if self.cell_type == "lstm":
            self.cell = nn.OptimizedLSTMCell(features=self.hidden_dim)
        elif self.cell_type == "gru":
            self.cell = nn.GRUCell(features=self.hidden_dim)
        else:
            raise ValueError(self.cell_type)
        self.cell_ln = nn.LayerNorm()

        if self.combine_method == "film":
            self.film_gamma = nn.Dense(self.obs_encoding_dim, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0))
            self.film_beta = nn.Dense(self.obs_encoding_dim, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0))

        self.torso_dense1 = nn.Dense(512, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0))
        self.torso_ln1 = nn.LayerNorm()
        self.torso_dense2 = nn.Dense(256, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0))
        self.torso_dense3 = nn.Dense(128, kernel_init=ortho(np.sqrt(2)), bias_init=constant(0.0))
        self.mean_head = nn.Dense(self.action_dim, kernel_init=ortho(0.01), bias_init=constant(0.0))
        self.logstd = self.param("policy_logstd", constant(float(np.log(self.std_dev))), (1, self.action_dim))

    def initialize_carry(self, nr_envs):
        zeros = jnp.zeros((nr_envs, self.hidden_dim), dtype=jnp.float32)
        if self.cell_type == "lstm":
            return (zeros, zeros)
        return zeros

    def _encode_cell_input(self, obs):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = self.cell_obs_encoder(obs)
        x = self.cell_obs_ln(x)
        return nn.elu(x)

    def _encode_obs(self, obs):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = self.obs_encoder(obs)
        x = self.obs_ln(x)
        return nn.elu(x)

    def _decode(self, obs_latent, cell_latent):
        h = self.cell_ln(cell_latent)
        h = nn.elu(h)
        if self.combine_method == "concat":
            torso_in = jnp.concatenate([obs_latent, h], axis=-1)
        else:
            torso_in = obs_latent * self.film_gamma(h) + self.film_beta(h)
        x = nn.elu(self.torso_ln1(self.torso_dense1(torso_in)))
        x = nn.elu(self.torso_dense2(x))
        x = nn.elu(self.torso_dense3(x))
        return self.mean_head(x), self.logstd

    def one_step(self, obs, carry):
        """obs [B, obs], carry -> (mean, logstd, next_carry)."""
        cell_in = self._encode_cell_input(obs)
        carry, hidden = self.cell(carry, cell_in)
        obs_latent = cell_in if self.share_encoder else self._encode_obs(obs)
        mean, logstd = self._decode(obs_latent, hidden)
        return mean, logstd, carry

    def sequence(self, obs_seq, done_seq, init_carry):
        """BPTT re-run: obs_seq [T, B, obs], done_seq [T, B] (done AFTER step
        t), init_carry valid for obs_seq[0] -> (mean [T, B, A], logstd)."""
        done_prev = jnp.concatenate(
            [jnp.zeros_like(done_seq[:1]), done_seq.astype(jnp.float32)[:-1]], axis=0
        )

        def step(carry, inp):
            obs_t, done_prev_t = inp
            carry = jax.tree.map(lambda c: c * (1.0 - done_prev_t)[:, None], carry)
            mean_t, logstd_t, carry = self.one_step(obs_t, carry)
            return carry, (mean_t, logstd_t)

        _, (mean_seq, logstd_seq) = jax.lax.scan(step, init_carry, (obs_seq, done_prev))
        return mean_seq, logstd_seq
