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
