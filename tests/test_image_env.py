"""IMAGES observation path: pixel-grid env + DQN with the Nature CNN."""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.classic.pixel_grid.tpu.environment import PixelGrid


def test_pixel_grid_renders_and_terminates():
    env = PixelGrid(nr_envs=4, horizon=16)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (4, 84, 84, 1)
    obs = np.asarray(state.observation)
    assert (obs.max(axis=(1, 2, 3)) == 255.0).all()  # agent pixel block
    # drive agent 0 onto its goal with scripted moves
    agent = np.asarray(state.physics.agent)
    goal = np.asarray(state.physics.goal)
    step = jax.jit(env.step)
    for _ in range(20):
        a = np.zeros(4, np.int32)
        dr = goal[0, 0] - np.asarray(state.physics.agent)[0, 0]
        dc = goal[0, 1] - np.asarray(state.physics.agent)[0, 1]
        if dr != 0:
            a[0] = 1 if dr > 0 else 0
        elif dc != 0:
            a[0] = 3 if dc > 0 else 2
        state = step(state, jnp.asarray(a))
        if bool(state.terminated[0]):
            assert float(state.reward[0]) == 1.0
            break
    else:
        raise AssertionError("scripted agent never reached the goal")


def test_ppo_cnn_on_pixel_grid():
    """Image-observation on-policy track: PPO with the NatureCNN encoder on
    both the policy and the critic (re-covers the reference's image PPO,
    `rl_x/algorithms/ppo/pytorch/policy.py:33-203`)."""
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "ppo.tpu",
        "classic.pixel_grid.tpu",
        **{
            "algorithm.total_timesteps": 2 * 8 * 8,
            "algorithm.nr_steps": 8,
            "algorithm.minibatch_size": 16,
            "algorithm.nr_epochs": 2,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(model.policy_state.params)[0]]
    assert any("Conv" in p for p in paths), "policy should use the CNN encoder"
    cpaths = [jax.tree_util.keystr(p) for p, _ in
              jax.tree_util.tree_flatten_with_path(model.critic_state.params)[0]]
    assert any("Conv" in p for p in cpaths), "critic should use the CNN encoder"
    model.train()
    for leaf in jax.tree.leaves(model.policy_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pqn_cnn_on_pixel_grid():
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "pqn.tpu",
        "classic.pixel_grid.tpu",
        **{
            "algorithm.total_timesteps": 2 * 8 * 8,
            "algorithm.nr_steps": 8,
            "algorithm.nr_minibatches": 2,
            "algorithm.nr_epochs": 1,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    model.train()
    for leaf in jax.tree.leaves(model.critic_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dqn_cnn_on_pixel_grid():
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "dqn.tpu",
        "classic.pixel_grid.tpu",
        **{
            "algorithm.total_timesteps": 192,
            "algorithm.learning_starts": 64,
            "algorithm.buffer_size": 512,
            "algorithm.batch_size": 16,
            "algorithm.logging_frequency": 64,
            "algorithm.update_frequency": 1,
            "algorithm.target_update_frequency": 64,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    # CNN path engaged: conv kernels present
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(model.states["critic"].params)[0]]
    assert any("Conv" in p for p in paths)
    model.train()
    for leaf in jax.tree.leaves(model.states["critic"].params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pixel_chase_frame_stack_contract():
    """PixelChase: 84x84x4 stacked obs (newest LAST), rolling correctly; the
    goal drifts every goal_period steps in a fixed per-episode direction —
    the dynamics that make the frame stack informative (VERDICT r4 #3)."""
    from rlx_tpu.environments.classic.pixel_chase.tpu.environment import PixelChase

    env = PixelChase(nr_envs=4, horizon=32, frame_stack=4, goal_period=2)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.observation.shape == (4, 84, 84, 4)
    # fresh episode: all stack slots equal the initial frame
    obs = np.asarray(state.observation)
    for k in range(1, 4):
        np.testing.assert_array_equal(obs[..., k], obs[..., 0])

    step = jax.jit(env.step)
    goal0 = np.asarray(state.physics.goal).copy()
    direction = np.asarray(state.physics.direction).copy()
    prev_obs = obs
    state = step(state, jnp.zeros(4, jnp.int32))
    obs1 = np.asarray(state.observation)
    # stack rolled: slots 0..2 of the new obs == slots 1..3 of the previous
    np.testing.assert_array_equal(obs1[..., :3], prev_obs[..., 1:])
    # goal_period=2: goal static after 1 step, moved after 2
    np.testing.assert_array_equal(np.asarray(state.physics.goal), goal0)
    state = step(state, jnp.zeros(4, jnp.int32))
    moves = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]])
    expected = (goal0 + moves[direction]) % env.grid_size
    live = ~np.asarray(state.terminated | state.truncated)
    np.testing.assert_array_equal(np.asarray(state.physics.goal)[live], expected[live])


def test_dqn_uint8_replay_on_pixel_chase():
    """Image replay stores uint8 (4x less HBM than f32); DQN trains through
    the u8 -> NatureCNN cast path."""
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "dqn.tpu",
        "classic.pixel_chase.tpu",
        **{
            "algorithm.total_timesteps": 192,
            "algorithm.learning_starts": 64,
            "algorithm.buffer_size": 512,
            "algorithm.batch_size": 16,
            "algorithm.logging_frequency": 64,
            "environment.nr_envs": 8,
            "runner.mesh_dp": -1,
        },
    )
    model = create_model(config)
    buf = model._make_buffer()
    assert buf.storage["observation"].dtype == jnp.uint8
    assert buf.storage["observation"].shape[-3:] == (84, 84, 4)
    model.train()
    for leaf in jax.tree.leaves(model.states["critic"].params):
        assert np.isfinite(np.asarray(leaf)).all()
