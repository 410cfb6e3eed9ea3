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


def mask_carry(carry, done):
    """Zero a recurrent carry per env where ``done`` (any leaf rank)."""
    done = done.astype(jnp.float32)

    def mask(c):
        keep = (1.0 - done).reshape((-1,) + (1,) * (c.ndim - 1))
        return c * keep

    return jax.tree.map(mask, carry)


class Mamba2Cell(nn.Module):
    """Mamba-2-style constant-memory sequence cell.

    Structure parity with `rl_x/algorithms/ppo_mamba2/flax_full_jit/policy.py:84-121`:
    gated in-projection -> depthwise causal conv one-step (conv state carry)
    -> SiLU -> selective diagonal SSM recurrence (per-channel dA = exp(dt*A),
    dB u input, C readout, D skip) -> SiLU gate -> out-projection, pre-LN
    residual.  Carry = {"conv": [B, K-1, D_inner], "ssm": [B, D_inner, N]}.
    """

    features: int          # d_model output dim
    state_dim: int = 16
    expand: int = 2
    conv_kernel: int = 4
    dt_min: float = 1e-3
    dt_max: float = 0.1

    @property
    def inner_dim(self):
        return self.features * self.expand

    def initialize_carry(self, nr_envs):
        return {
            "conv": jnp.zeros((nr_envs, self.conv_kernel - 1, self.inner_dim)),
            "ssm": jnp.zeros((nr_envs, self.inner_dim, self.state_dim)),
        }

    @nn.compact
    def __call__(self, carry, x):
        inner = self.inner_dim
        residual = x
        x = nn.LayerNorm()(x)
        u, z = jnp.split(nn.Dense(2 * inner)(x), 2, axis=-1)

        # depthwise causal conv, one token
        conv_kernel = self.param(
            "conv_kernel", nn.initializers.normal(0.02), (self.conv_kernel, inner)
        )
        conv_bias = self.param("conv_bias", constant(0.0), (inner,))
        conv_in = jnp.concatenate([carry["conv"], u[:, None, :]], axis=1)  # [B, K, D]
        next_conv = conv_in[:, 1:, :]
        u = (conv_in * conv_kernel[None]).sum(axis=1) + conv_bias[None]
        u = nn.silu(u)

        # selective diagonal SSM
        params = nn.Dense(inner + 2 * self.state_dim)(u)
        dt_raw = params[..., :inner]
        b_t = params[..., inner: inner + self.state_dim]
        c_t = params[..., inner + self.state_dim:]

        def dt_bias_init(key, shape):
            dt = jnp.exp(jax.random.uniform(
                key, shape, minval=np.log(self.dt_min), maxval=np.log(self.dt_max)
            ))
            return dt + jnp.log(-jnp.expm1(-dt))

        dt_bias = self.param("dt_bias", dt_bias_init, (inner,))
        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.tile(
                jnp.log(jnp.arange(1, self.state_dim + 1, dtype=jnp.float32))[None], (inner, 1)
            ),
            (inner, self.state_dim),
        )
        D_skip = self.param("D", constant(1.0), (inner,))

        dt = nn.softplus(dt_raw + dt_bias[None])
        dA = jnp.exp(dt[..., None] * (-jnp.exp(A_log))[None])     # [B, D, N]
        next_ssm = dA * carry["ssm"] + dt[..., None] * b_t[:, None, :] * u[..., None]
        y = (next_ssm * c_t[:, None, :]).sum(-1) + D_skip[None] * u

        y = y * nn.silu(z)
        out = residual + nn.Dense(self.features)(y)
        return {"conv": next_conv, "ssm": next_ssm}, out


class TransformerBlock(nn.Module):
    """One pre-LN attention+MLP block with a streaming KV cache AND a
    parallel banded-causal sequence path sharing the same parameters.

    Cache: {"k": [B, L-1, F], "v": [B, L-1, F], "valid": [B, L-1]}, ordered
    oldest -> newest; the learned relative-age bias is indexed by cache slot
    (slot L-1 = the current token), so both paths index it identically.
    """

    features: int
    context_len: int = 16
    nr_heads: int = 4
    mlp_expand: int = 4

    def setup(self):
        self.ln1 = nn.LayerNorm()
        self.wq = nn.Dense(self.features)
        self.wk = nn.Dense(self.features)
        self.wv = nn.Dense(self.features)
        self.wo = nn.Dense(self.features)
        self.ln2 = nn.LayerNorm()
        self.mlp1 = nn.Dense(self.features * self.mlp_expand)
        self.mlp2 = nn.Dense(self.features)
        # attention logits/mixing run at full f32 precision: under the TPU
        # default (bf16 passes) the q.k dots carry ~1e-2 noise, which on the
        # marginal masked-Pendulum task was the difference between learning
        # (-576 on CPU/f32) and not (-1037 on TPU/bf16); these einsums are
        # tiny (L<=16), so HIGHEST precision costs nothing measurable
        self.attn_precision = jax.lax.Precision.HIGHEST

        # learned relative-age bias, initialized with a per-head recency
        # prior (ALiBi-style slopes): head h starts attending mostly to the
        # last ~2^h tokens, so short-range credit assignment works before
        # content-based attention is learned.  Slot L-1 = the current token.
        def age_bias_init(key, shape):
            heads, L = shape
            ages = np.arange(L - 1, -1, -1, dtype=np.float32)  # slot age
            slopes = 2.0 ** (-np.arange(1, heads + 1, dtype=np.float32))
            return jnp.asarray(-slopes[:, None] * ages[None, :])

        self.age_bias = self.param(
            "age_bias", age_bias_init, (self.nr_heads, self.context_len)
        )

    def _mlp(self, x):
        return x + self.mlp2(nn.gelu(self.mlp1(self.ln2(x))))

    def streaming(self, cache, x):
        """One token: x [B, F], cache -> (new_cache, out [B, F])."""
        head_dim = self.features // self.nr_heads
        residual = x
        h = self.ln1(x)
        q, k, v = self.wq(h), self.wk(h), self.wv(h)

        keys = jnp.concatenate([cache["k"], k[:, None]], axis=1)      # [B, L, F]
        values = jnp.concatenate([cache["v"], v[:, None]], axis=1)
        valid = jnp.concatenate([cache["valid"], jnp.ones_like(cache["valid"][:, :1])], axis=1)

        B, L, _ = keys.shape
        qh = q.reshape(B, self.nr_heads, head_dim)
        kh = keys.reshape(B, L, self.nr_heads, head_dim)
        vh = values.reshape(B, L, self.nr_heads, head_dim)

        logits = jnp.einsum("bhd,blhd->bhl", qh, kh,
                            precision=self.attn_precision) / np.sqrt(head_dim)
        logits = logits + self.age_bias[None]
        logits = jnp.where(valid[:, None, :] > 0.5, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhl,blhd->bhd", attn, vh,
                         precision=self.attn_precision).reshape(B, self.features)
        x = residual + self.wo(out)
        x = self._mlp(x)
        new_cache = {"k": keys[:, 1:], "v": values[:, 1:], "valid": valid[:, 1:]}
        return new_cache, x

    def parallel(self, cache, x_seq, seg):
        """Whole window in parallel: x_seq [T, B, F], seg [T, B] episode
        segment ids (cumsum of prev-step dones; seg[0] == 0).  Numerically
        identical to scanning ``streaming`` over t (unit-tested), but every
        Dense runs one [T*B, F] matmul and the banded attention is one
        einsum — the reference's train-time strategy
        (`ppo_transformer/flax_full_jit/policy.py:300-345`) rebuilt for the
        streaming-cache semantics (the initial cache joins the band)."""
        T, B, F = x_seq.shape
        L = self.context_len
        head_dim = F // self.nr_heads
        residual = x_seq
        h = self.ln1(x_seq)
        q, k, v = self.wq(h), self.wk(h), self.wv(h)

        # keys/values timeline: L-1 cache tokens then the T window tokens
        k_all = jnp.concatenate([jnp.moveaxis(cache["k"], 0, 1), k], axis=0)  # [L-1+T, B, F]
        v_all = jnp.concatenate([jnp.moveaxis(cache["v"], 0, 1), v], axis=0)

        # sliding windows: query t attends timeline slots [t .. t+L-1]
        # (source tokens t-L+1 .. t); slot order matches the streaming cache
        window_idx = np.arange(T)[:, None] + np.arange(L)[None, :]        # [T, L]
        kw = k_all[window_idx]                                            # [T, L, B, F]
        vw = v_all[window_idx]

        qh = q.reshape(T, B, self.nr_heads, head_dim)
        kh = kw.reshape(T, L, B, self.nr_heads, head_dim)
        vh = vw.reshape(T, L, B, self.nr_heads, head_dim)
        logits = jnp.einsum("tbhd,tlbhd->tbhl", qh, kh,
                            precision=self.attn_precision) / np.sqrt(head_dim)
        logits = logits + self.age_bias[None, None]                       # [T, B, H, L]

        # validity: window slot l of query t is source s = t - (L-1) + l
        #  - s >= 0 (in-window):  same episode segment as the query
        #  - s < 0  (cache):      cache valid AND no done since window start
        src = window_idx - (L - 1)                                        # [T, L]
        in_window = src >= 0
        src_seg = seg[jnp.clip(src, 0, T - 1)]                            # [T, L, B]
        same_seg = src_seg == seg[:, None, :]                             # [T, L, B]
        cache_valid = jnp.moveaxis(cache["valid"], 0, 1)                  # [L-1, B]
        cache_valid = jnp.concatenate(
            [cache_valid, jnp.zeros((T, cache_valid.shape[1]))], axis=0
        )[window_idx]                                                     # [T, L, B]
        no_done_yet = (seg == 0)[:, None, :]                              # [T, 1, B]
        valid = jnp.where(in_window[:, :, None], same_seg,
                          (cache_valid > 0.5) & no_done_yet)              # [T, L, B]
        logits = jnp.where(jnp.moveaxis(valid, 1, 2)[:, :, None, :], logits, -1e9)

        attn = jax.nn.softmax(logits, axis=-1)                            # [T, B, H, L]
        out = jnp.einsum("tbhl,tlbhd->tbhd", attn, vh,
                         precision=self.attn_precision).reshape(T, B, F)
        x = residual + self.wo(out)
        return self._mlp(x)


class TransformerCell(nn.Module):
    """Sliding-window causal self-attention as a streaming cell (KV cache).

    Capability parity with `rl_x/algorithms/ppo_transformer/flax_full_jit/policy.py`
    (context of the last ``context_len`` tokens, padding mask for short
    histories, episode-segment isolation).  Acting streams one token over a
    per-block KV cache; training runs the SAME parameters in parallel over
    the whole rollout window with a banded-causal + segment mask
    (`policy.py:300-345`), so the in-loss re-run costs one attention einsum
    instead of a T-step sequential scan (the round-3 streaming-only re-run
    was ~40x slower than the LSTM variant on the same budget).  A learned
    relative-age bias replaces sinusoidal PE (streaming-friendly).

    Carry per block: {"k": [B, L-1, F], "v": [B, L-1, F], "valid": [B, L-1]}.
    """

    features: int
    context_len: int = 16
    nr_heads: int = 4
    nr_blocks: int = 2
    mlp_expand: int = 4

    def setup(self):
        self.blocks = [
            TransformerBlock(
                features=self.features, context_len=self.context_len,
                nr_heads=self.nr_heads, mlp_expand=self.mlp_expand,
                name=f"block{b}",
            )
            for b in range(self.nr_blocks)
        ]

    def initialize_carry(self, nr_envs):
        L = self.context_len - 1
        return {
            f"block{b}": {
                "k": jnp.zeros((nr_envs, L, self.features)),
                "v": jnp.zeros((nr_envs, L, self.features)),
                "valid": jnp.zeros((nr_envs, L)),
            }
            for b in range(self.nr_blocks)
        }

    def __call__(self, carry, x):
        new_carry = {}
        for b, block in enumerate(self.blocks):
            new_carry[f"block{b}"], x = block.streaming(carry[f"block{b}"], x)
        return new_carry, x

    def sequence(self, init_carry, x_seq, done_prev):
        """Parallel training path: x_seq [T, B, F], done_prev [T, B]
        (done BEFORE consuming step t; done_prev[0] == 0) -> [T, B, F]."""
        seg = jnp.cumsum(done_prev.astype(jnp.int32), axis=0)  # [T, B]
        for b, block in enumerate(self.blocks):
            x_seq = block.parallel(init_carry[f"block{b}"], x_seq, seg)
        return x_seq


class RecurrentPolicy(nn.Module):
    action_dim: int
    cell_type: str = "lstm"  # "lstm" | "gru" | "mamba2" | "transformer"
    std_dev: float = 1.0
    obs_encoding_dim: int = 128
    hidden_dim: int = 64
    combine_method: str = "concat"  # "concat" | "film"
    share_encoder: bool = False
    observation_indices: Sequence[int] = None
    # mamba2 cell
    cell_state_dim: int = 16
    cell_conv_kernel: int = 4
    # transformer cell
    cell_context_len: int = 16
    cell_nr_heads: int = 4
    cell_nr_blocks: int = 2

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
        elif self.cell_type == "mamba2":
            self.cell = Mamba2Cell(
                features=self.obs_encoding_dim,
                state_dim=self.cell_state_dim,
                conv_kernel=self.cell_conv_kernel,
            )
        elif self.cell_type == "transformer":
            self.cell = TransformerCell(
                features=self.obs_encoding_dim,
                context_len=self.cell_context_len,
                nr_heads=self.cell_nr_heads,
                nr_blocks=self.cell_nr_blocks,
            )
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
        if self.cell_type == "lstm":
            zeros = jnp.zeros((nr_envs, self.hidden_dim), dtype=jnp.float32)
            return (zeros, zeros)
        if self.cell_type == "gru":
            return jnp.zeros((nr_envs, self.hidden_dim), dtype=jnp.float32)
        if self.cell_type == "mamba2":
            inner = self.obs_encoding_dim * 2  # Mamba2Cell expand=2
            return {
                "conv": jnp.zeros((nr_envs, self.cell_conv_kernel - 1, inner)),
                "ssm": jnp.zeros((nr_envs, inner, self.cell_state_dim)),
            }
        L = self.cell_context_len - 1
        return {
            f"block{b}": {
                "k": jnp.zeros((nr_envs, L, self.obs_encoding_dim)),
                "v": jnp.zeros((nr_envs, L, self.obs_encoding_dim)),
                "valid": jnp.zeros((nr_envs, L)),
            }
            for b in range(self.cell_nr_blocks)
        }

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
        t), init_carry valid for obs_seq[0] -> (mean [T, B, A], logstd).

        Transformer runs the whole window in parallel (banded attention, one
        [T*B]-row matmul per Dense — numerically identical to the streaming
        scan, unit-tested); the true recurrences (LSTM/GRU/Mamba) scan time
        with the env minibatch batched inside each step."""
        done_prev = jnp.concatenate(
            [jnp.zeros_like(done_seq[:1]), done_seq.astype(jnp.float32)[:-1]], axis=0
        )

        if self.cell_type == "transformer":
            cell_in = self._encode_cell_input(obs_seq)          # [T, B, F]
            hidden_seq = self.cell.sequence(init_carry, cell_in, done_prev)
            obs_latent = cell_in if self.share_encoder else self._encode_obs(obs_seq)
            return self._decode(obs_latent, hidden_seq)

        def step(carry, inp):
            obs_t, done_prev_t = inp
            carry = mask_carry(carry, done_prev_t)
            mean_t, logstd_t, carry = self.one_step(obs_t, carry)
            return carry, (mean_t, logstd_t)

        _, (mean_seq, logstd_seq) = jax.lax.scan(step, init_carry, (obs_seq, done_prev))
        return mean_seq, logstd_seq
