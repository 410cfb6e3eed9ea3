"""PPO end-to-end: the fused training program compiles, runs over an
8-device dp mesh (virtual CPU devices), updates parameters, and improves
return on Pendulum when given a little budget (slow-marked)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlx_tpu.config import create_model, make_config


def tiny_config(**overrides):
    base = {
        "algorithm.total_timesteps": 2 * 8 * 16,
        "algorithm.nr_steps": 16,
        "algorithm.minibatch_size": 32,
        "algorithm.nr_epochs": 2,
        "environment.nr_envs": 8,
        "runner.mesh_dp": -1,  # all 8 virtual devices
    }
    base.update(overrides)
    return make_config("ppo.tpu", "classic.pendulum.tpu", **base)


def test_ppo_train_step_runs_on_mesh():
    config = tiny_config()
    model = create_model(config)
    assert model.mesh.shape["dp"] == 8

    initial_params = jax.tree.map(np.asarray, model.policy_state.params)
    model.train()
    # params changed and are finite
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        initial_params,
        model.policy_state.params,
    )
    assert any(jax.tree.leaves(changed))
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ppo_eval_and_test():
    config = tiny_config(**{"algorithm.evaluation_active": True})
    model = create_model(config)
    model.train()
    returns = model.test(1)
    assert len(returns) == 1 and np.isfinite(returns[0])


def test_ppo_save_load_roundtrip(tmp_path):
    config = tiny_config(**{"runner.save_model": True})
    model = create_model(config, run_path=str(tmp_path))
    model.train()
    saved_params = jax.tree.map(np.asarray, model.policy_state.params)

    config2 = tiny_config()
    config2.runner.load_model = str(tmp_path / "models" / "latest.model")
    from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
    from rlx_tpu.config import create_env

    train_env, eval_env = create_env(config2)
    model2 = PPO.load(config2, train_env, eval_env, str(tmp_path), None, [])
    for a, b in zip(jax.tree.leaves(saved_params), jax.tree.leaves(model2.policy_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_ppo_learns_pendulum():
    # Tuned Pendulum PPO hyperparameters (gamma=0.9 is the known unlock).
    config = make_config(
        "ppo.tpu",
        "classic.pendulum.tpu",
        **{
            "algorithm.total_timesteps": 200_000,
            "algorithm.nr_steps": 256,
            "algorithm.minibatch_size": 512,
            "algorithm.nr_epochs": 10,
            "algorithm.learning_rate": 1e-3,
            "algorithm.gamma": 0.9,
            "algorithm.entropy_coef": 0.0,
            "environment.nr_envs": 8,
            "algorithm.evaluation_active": False,
        },
    )
    model = create_model(config)
    model.train()

    # deterministic eval
    env = model.eval_env
    state = env.reset(jax.random.PRNGKey(123), eval_mode=True)
    step = jax.jit(env.step)
    for _ in range(env.horizon):
        action = model.policy.mode(model.policy_state.params, state.observation)
        state = step(state, action)
    mean_return = float(jnp.mean(state.info["rollout/episode_return"]))
    # random policy gets about -1200; a trained one should be far better
    assert mean_return > -700, mean_return


def test_ppo_full_state_resume(tmp_path):
    """Preemption-safe checkpoint: optimizer state and step counter survive
    the save/load roundtrip."""
    config = tiny_config(**{"runner.save_model": True, "runner.save_optimizer_state": True})
    model = create_model(config, run_path=str(tmp_path))
    model.train()
    saved_step = int(model.policy_state.step)
    assert saved_step > 0
    model.save()

    config2 = tiny_config(**{"runner.save_optimizer_state": True})
    config2.runner.load_model = str(tmp_path / "models" / "latest.model")
    from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
    from rlx_tpu.config import create_env

    train_env, eval_env = create_env(config2)
    model2 = PPO.load(config2, train_env, eval_env, str(tmp_path), None, [])
    assert int(model2.policy_state.step) == saved_step
    # adam moments restored (non-zero after training)
    mu_leaves = jax.tree.leaves(model2.policy_state.opt_state[1].inner_state[0].mu)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in mu_leaves)


def test_ppo_best_model_checkpoint(tmp_path):
    """best.model is written alongside latest.model, tracking the best
    eval return (`ppo/flax/ppo.py:350-356` semantics)."""
    config = tiny_config(**{
        "runner.save_model": True,
        "algorithm.evaluation_active": True,
        "algorithm.total_timesteps": 4 * 8 * 16,
        "algorithm.evaluation_and_save_frequency": 2 * 8 * 16,
    })
    model = create_model(config, run_path=str(tmp_path))
    model.train()
    assert (tmp_path / "models" / "latest.model").exists()
    assert (tmp_path / "models" / "best.model").exists()

    config2 = tiny_config()
    config2.runner.load_model = str(tmp_path / "models" / "best.model")
    from rlx_tpu.algorithms.ppo.tpu.ppo import PPO
    from rlx_tpu.config import create_env

    train_env, eval_env = create_env(config2)
    model2 = PPO.load(config2, train_env, eval_env, str(tmp_path), None, [])
    for leaf in jax.tree.leaves(model2.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("dp", [1, 8])
def test_packed_minibatch_pipeline_matches_reference_gathers(dp):
    """The packed single-gather-per-epoch pipeline (TPU fast path) must
    produce IDENTICAL updates to the naive five-gathers-per-minibatch
    formulation (the reference semantics, `ppo/flax_full_jit/ppo.py:229-231`)
    — same permutation bits, same minibatch contents, same order."""
    import optax

    config = tiny_config(**{
        "environment.nr_envs": 16,
        "algorithm.nr_steps": 8,
        "algorithm.minibatch_size": 32,
        "algorithm.nr_epochs": 3,
        "algorithm.total_timesteps": 16 * 8,
        "runner.mesh_dp": dp,
    })
    model = create_model(config)
    B = model.batch_size
    obs_dim = model.os_shape[0]
    action_dim = int(np.prod(model.as_shape))
    k = jax.random.PRNGKey(7)
    batch = (
        jax.random.normal(k, (B, obs_dim)),
        jax.random.normal(jax.random.fold_in(k, 1), (B, action_dim)),
        jax.random.normal(jax.random.fold_in(k, 2), (B,)),
        jax.random.normal(jax.random.fold_in(k, 3), (B,)),
        jax.random.normal(jax.random.fold_in(k, 4), (B,)),
    )
    opt_key = jax.random.PRNGKey(11)
    ps1, cs1, m1 = jax.jit(model._optimize)(model.policy_state, model.critic_state, batch, opt_key)

    # naive reference formulation: same index generation, per-minibatch gathers
    def reference_optimize(policy_state, critic_state, batch_arrays, key):
        bo, ba, blp, bret, badv = batch_arrays
        grad_loss_fn = jax.value_and_grad(model._loss_fn, argnums=(0, 1), has_aux=True)
        key, perm_key = jax.random.split(key)
        if model.shard_local_minibatching:
            rows = B // dp
            mb_local = model.minibatch_size // dp
            idx = jnp.tile(jnp.arange(rows), (model.nr_epochs, dp, 1))
            idx = jax.random.permutation(perm_key, idx, axis=-1, independent=True)
            idx = idx.reshape(model.nr_epochs, dp, model.nr_minibatches, mb_local)
            idx = jnp.moveaxis(idx, 1, 2).reshape((-1, dp, mb_local))

            def gather(x, mb_idx):
                xb = x.reshape((dp, rows) + x.shape[1:])
                ix = mb_idx.reshape((dp, mb_local) + (1,) * (x.ndim - 1))
                return jnp.take_along_axis(xb, ix, axis=1).reshape(
                    (model.minibatch_size,) + x.shape[1:])
        else:
            idx = jnp.tile(jnp.arange(B), (model.nr_epochs, 1))
            idx = jax.random.permutation(perm_key, idx, axis=1, independent=True)
            idx = idx.reshape((-1, model.minibatch_size))

            def gather(x, mb_idx):
                return x[mb_idx]

        def mb_update(carry, mb_idx):
            policy_state, critic_state = carry
            adv = gather(badv, mb_idx)
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            (_, metrics), (pg, cg) = grad_loss_fn(
                policy_state.params, critic_state.params,
                gather(bo, mb_idx), gather(ba, mb_idx), gather(blp, mb_idx),
                gather(bret, mb_idx), adv)
            return (policy_state.apply_gradients(grads=pg), critic_state.apply_gradients(grads=cg)), metrics

        (policy_state, critic_state), metrics = jax.lax.scan(
            mb_update, (policy_state, critic_state), idx)
        return policy_state, critic_state, jax.tree.map(jnp.mean, metrics)

    ps2, cs2, m2 = jax.jit(reference_optimize)(model.policy_state, model.critic_state, batch, opt_key)

    for a, b in zip(jax.tree.leaves(ps1.params), jax.tree.leaves(ps2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(cs1.params), jax.tree.leaves(cs2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for k2 in ("loss/policy_gradient_loss", "loss/critic_loss"):
        np.testing.assert_allclose(np.asarray(m1[k2]), np.asarray(m2[k2]), rtol=1e-6)


def test_run_provenance_capture(tmp_path):
    """provenance.json + diff.patch land in the run dir (reference
    `rl_x/runner/runner.py:301-320`, here wandb-independent)."""
    import json

    from rlx_tpu.runner.runner import Runner

    runner = object.__new__(Runner)
    config = tiny_config()
    runner._log_run_provenance(config, str(tmp_path))
    with open(tmp_path / "provenance.json") as f:
        provenance = json.load(f)
    assert "python_packages" in provenance and "jax" in provenance["python_packages"]
    assert "git_commit_hash" in provenance
    assert (tmp_path / "diff.patch").exists()


def test_parallel_seeds_vmapped_training():
    """nr_parallel_seeds > 1 vmaps the whole training program over seeds
    (net init + env reset + train scan); eval_history gains a seed axis and
    the seeds genuinely differ (reference caps this at 1,
    `ppo/flax_full_jit/ppo.py:70-71`)."""
    import numpy as np

    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "ppo.tpu", "classic.pendulum.tpu",
        **{
            "environment.nr_envs": 8, "algorithm.nr_steps": 8,
            "algorithm.minibatch_size": 16, "algorithm.total_timesteps": 256,
            "algorithm.evaluation_and_save_frequency": 128,
            "algorithm.nr_parallel_seeds": 4,
            "algorithm.logging_active": False,
            "runner.save_model": False,
        },
    )
    model = create_model(config)
    model.train()
    returns = model.eval_history["eval/episode_return"]
    assert returns.shape == (4, 2)  # [seeds, eval points]
    assert np.isfinite(returns).all()
    # independent seeds must not produce identical runs
    assert len({float(r) for r in returns[:, -1]}) > 1
