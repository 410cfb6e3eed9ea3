"""Memory suite: recurrent policy carry semantics + PPO-LSTM/GRU e2e on the
virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config
from rlx_tpu.models.recurrent import RecurrentPolicy


@pytest.mark.parametrize("cell", ["lstm", "gru", "mamba2", "transformer"])
def test_sequence_matches_stepwise_with_done_resets(cell):
    """forward_sequence with done-masked resets must equal stepping one_step
    manually and zeroing the carry after dones."""
    policy = RecurrentPolicy(action_dim=2, cell_type=cell, obs_encoding_dim=8, hidden_dim=4,
                             cell_context_len=4, cell_nr_heads=2, cell_nr_blocks=1,
                             cell_state_dim=4, cell_conv_kernel=3)
    B, T = 3, 6
    key = jax.random.PRNGKey(0)
    obs_seq = jax.random.normal(key, (T, B, 5))
    dones = jnp.zeros((T, B)).at[2, 0].set(1.0).at[4, 2].set(1.0)
    carry0 = policy.initialize_carry(B)
    params = policy.init(jax.random.PRNGKey(1), obs_seq[0], carry0, method=policy.one_step)

    mean_seq, logstd_seq = policy.apply(params, obs_seq, dones, carry0, method=policy.sequence)

    carry = carry0
    for t in range(T):
        mean_t, _, carry = policy.apply(params, obs_seq[t], carry, method=policy.one_step)
        np.testing.assert_allclose(np.asarray(mean_seq[t]), np.asarray(mean_t), atol=1e-5)
        from rlx_tpu.models.recurrent import mask_carry
        carry = mask_carry(carry, dones[t])


def test_transformer_parallel_sequence_matches_streaming_with_warm_cache():
    """The transformer's parallel training path (banded attention over the
    window + initial KV cache) must reproduce the streaming scan exactly,
    including attention INTO a non-empty rollout-initial cache and segment
    isolation at dones."""
    from rlx_tpu.models.recurrent import mask_carry

    policy = RecurrentPolicy(action_dim=2, cell_type="transformer", obs_encoding_dim=8,
                             hidden_dim=4, cell_context_len=4, cell_nr_heads=2,
                             cell_nr_blocks=2)
    B, T, WARM = 3, 7, 5
    key = jax.random.PRNGKey(3)
    warm_obs = jax.random.normal(key, (WARM, B, 5))
    obs_seq = jax.random.normal(jax.random.fold_in(key, 1), (T, B, 5))
    dones = jnp.zeros((T, B)).at[2, 0].set(1.0).at[4, 2].set(1.0).at[5, 2].set(1.0)
    warm_dones = jnp.zeros((WARM, B)).at[3, 1].set(1.0)

    carry = policy.initialize_carry(B)
    params = policy.init(jax.random.PRNGKey(1), warm_obs[0], carry, method=policy.one_step)

    # warm the cache with a streaming prefix (including a done)
    for t in range(WARM):
        _, _, carry = policy.apply(params, warm_obs[t], carry, method=policy.one_step)
        carry = mask_carry(carry, warm_dones[t])

    mean_par, logstd_par = policy.apply(params, obs_seq, dones, carry, method=policy.sequence)

    c = carry
    for t in range(T):
        mean_t, logstd_t, c = policy.apply(params, obs_seq[t], c, method=policy.one_step)
        np.testing.assert_allclose(np.asarray(mean_par[t]), np.asarray(mean_t),
                                   atol=1e-5, err_msg=f"t={t}")
        c = mask_carry(c, dones[t])


@pytest.mark.parametrize("algorithm", ["ppo_lstm.tpu", "ppo_gru.tpu", "ppo_mamba2.tpu", "ppo_transformer.tpu"])
def test_recurrent_ppo_trains(algorithm):
    config = make_config(
        algorithm,
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 2 * 8 * 16,
            "algorithm.nr_steps": 16,
            "algorithm.nr_minibatches": 2,
            "algorithm.nr_epochs": 2,
            "algorithm.obs_encoding_dim": 16,
            "algorithm.rnn_hidden_dim": 8,
            "algorithm.critic_hidden_sizes": (32, 32),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    initial = jax.tree.map(np.asarray, model.policy_state.params)
    model.train()
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial, model.policy_state.params,
    )
    assert any(jax.tree.leaves(changed))
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    returns = model.test(1)
    assert np.isfinite(returns[0])


def test_ppo_lstm_film_combine():
    config = make_config(
        "ppo_lstm.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 8 * 16,
            "algorithm.nr_steps": 16,
            "algorithm.nr_minibatches": 2,
            "algorithm.nr_epochs": 1,
            "algorithm.rnn_obs_combine_method": "film",
            "algorithm.obs_encoding_dim": 16,
            "algorithm.rnn_hidden_dim": 8,
            "algorithm.critic_hidden_sizes": (16,),
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
