"""Unitree Go2 deployment runner against the fake SDK.

Pins the joystick wire format, mode state machine, safety override,
stand/lie interpolation and the 45-dim observation contract against the
training env's policy subset
(reference behavior: `rl_x/.../deployment/unitree_go2/run.py:28-383`).
"""

import numpy as np
import pytest

from rlx_tpu.environments.locomotion.robot.deployment.unitree_go2.run import (
    Go2DeploymentRunner,
    NOMINAL_JOINT_POSITIONS,
    RemoteControllerState,
    gravity_vector_from_quat_wxyz,
)
from rlx_tpu.environments.locomotion.robot.deployment.unitree_go2.sdk import FakeGo2SDK


def make_runner(policy=None):
    sdk = FakeGo2SDK()
    if policy is None:
        policy = lambda obs: np.zeros(12)
    runner = Go2DeploymentRunner(sdk, policy_apply=policy)
    return sdk, runner


def press(sdk, buttons=(), **sticks):
    sdk.state.wireless_remote = RemoteControllerState.pack(buttons=buttons, **sticks)


def test_remote_pack_parse_roundtrip():
    data = RemoteControllerState.pack(
        buttons=["A", "L1", "Start", "Up"], Lx=0.25, Rx=-0.5, Ry=0.75, Ly=-1.0
    )
    remote = RemoteControllerState()
    remote.parse(data)
    assert remote.A == 1 and remote.L1 == 1 and remote.Start == 1 and remote.Up == 1
    assert remote.B == 0 and remote.X == 0
    np.testing.assert_allclose(
        [remote.Lx, remote.Rx, remote.Ry, remote.Ly], [0.25, -0.5, 0.75, -1.0], rtol=1e-6
    )


def test_factory_mode_released_and_stop_publishes_nothing():
    sdk, runner = make_runner()
    assert sdk.released
    press(sdk, buttons=["A"])
    runner.tick()
    assert runner.control_mode == "stop"
    assert sdk.published == []


def test_stand_up_ramps_to_nominal():
    sdk, runner = make_runner()
    sdk.state.joint_positions = np.full(12, 0.3)
    press(sdk, buttons=["Y"])
    steps = int(runner.stand_and_lie_seconds * runner.control_frequency)
    for _ in range(steps + 5):
        runner.tick()
    targets, kp, kd = sdk.published[-1]
    np.testing.assert_allclose(targets, NOMINAL_JOINT_POSITIONS, atol=1e-9)
    assert kp == runner.stand_and_lie_p_gain and kd == runner.stand_and_lie_d_gain
    # first command is one interpolation step away from the start pose
    first = sdk.published[0][0]
    expected_first = 0.3 + (NOMINAL_JOINT_POSITIONS - 0.3) / steps
    np.testing.assert_allclose(first, expected_first, atol=1e-9)


def test_nn_engages_only_from_standing():
    sdk, runner = make_runner()
    press(sdk, buttons=["B"])
    runner.tick()  # from None: refused
    assert sdk.published == []
    press(sdk, buttons=["Y"])
    runner.tick()
    press(sdk, buttons=["B"])
    runner.tick()  # from stand_up: engages
    targets, kp, kd = sdk.published[-1]
    assert kp == runner.nn_p_gain and kd == runner.nn_d_gain
    np.testing.assert_allclose(targets, NOMINAL_JOINT_POSITIONS, atol=1e-9)  # zero action


def test_nn_action_scaling_and_previous_action():
    actions = [np.full(12, 0.5), np.full(12, -0.25)]
    calls = []

    def policy(obs):
        calls.append(obs.copy())
        return actions[min(len(calls) - 1, 1)]

    sdk, runner = make_runner(policy)
    press(sdk, buttons=["Y"])
    runner.tick()
    press(sdk, buttons=["B"])
    runner.tick()
    targets, _, _ = sdk.published[-1]
    np.testing.assert_allclose(
        targets, NOMINAL_JOINT_POSITIONS + runner.scaling_factor * 0.5, atol=1e-9
    )
    runner.tick()
    # second observation sees the first action in the prev-action slot (/10)
    np.testing.assert_allclose(calls[1][24:36], 0.5 / 10.0, atol=1e-9)


def test_observation_layout_and_normalization():
    sdk, runner = make_runner()
    sdk.state.joint_positions = NOMINAL_JOINT_POSITIONS + 0.314
    sdk.state.joint_velocities = np.full(12, 5.0)
    sdk.state.angular_velocity = np.array([100.0, -100.0, 25.0])  # clips at +-1
    # roll robot 180 deg about x: gravity flips to +z in body frame
    sdk.state.orientation_wxyz = np.array([0.0, 1.0, 0.0, 0.0])
    press(sdk, Ly=1.0, Lx=-0.5, Rx=0.05)  # Rx under the zero-clip threshold
    runner.tick()  # parse remote
    obs = runner.assemble_observation(sdk.state)
    assert obs.shape == (45,)
    np.testing.assert_allclose(obs[0:12], 0.314 / 3.14, atol=1e-9)
    np.testing.assert_allclose(obs[12:24], 0.05, atol=1e-9)
    np.testing.assert_allclose(obs[24:36], 0.0, atol=1e-9)
    np.testing.assert_allclose(obs[36:39], [1.0, -1.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(obs[39:42], [0.8, 0.4, 0.0], atol=1e-7)  # goals
    np.testing.assert_allclose(obs[42:45], [0.0, 0.0, 1.0], atol=1e-9)  # gravity


def test_velocity_safety_forces_stand_up():
    sdk, runner = make_runner()
    press(sdk, buttons=["Y"])
    runner.tick()
    press(sdk, buttons=["B"])
    runner.tick()
    assert runner.control_mode == "nn"
    press(sdk)  # no buttons held
    sdk.state.joint_velocities = np.full(12, 30.0)
    runner.tick()
    assert runner.control_mode == "stand_up"


def test_gravity_vector_identity_quat():
    np.testing.assert_allclose(
        gravity_vector_from_quat_wxyz([1.0, 0.0, 0.0, 0.0]), [0.0, 0.0, -1.0], atol=1e-12
    )


def test_checkpoint_mirror_net_loads(tmp_path):
    """End-to-end: save a PPO checkpoint on the locomotion env config shape,
    reload it through load_policy_apply, and check the mirror net output
    matches the training policy on the policy observation subset."""
    import jax
    import jax.numpy as jnp

    from rlx_tpu.environments.locomotion.robot.deployment.unitree_go2.run import (
        load_policy_apply,
    )
    from rlx_tpu.models.mlp import GaussianPolicy
    from rlx_tpu.utils import checkpoint as ckpt

    cfg = {
        "policy_hidden_sizes": [32, 32],
        "activation": "elu",
        "layer_norm": True,
        "std_dev": 1.0,
    }
    policy = GaussianPolicy(
        action_dim=12, hidden_sizes=(32, 32), activation="elu",
        layer_norm=True, std_dev=1.0,
    )
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)))
    ckpt.save_model_file(str(tmp_path), "latest.model", {"policy": params, "critic": params}, cfg)

    apply = load_policy_apply(str(tmp_path / "latest.model"))
    obs = np.linspace(-1.0, 1.0, 45)
    action = apply(obs)
    expected, _ = policy.apply(params, obs[None])
    np.testing.assert_allclose(action, np.asarray(expected[0]), rtol=1e-5, atol=1e-6)
