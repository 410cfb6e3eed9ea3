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
