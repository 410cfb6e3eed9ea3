"""Socket custom-interface env: wire protocol + PPO smoke against a fake
client running in a thread (a 1D point-mass 'simulator')."""

import json
import socket
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def fake_client(port, nr_steps=2000):
    """Speaks the reference wire protocol: init handshake, then reaction per
    received action (first reaction doubles as the reset observation)."""
    for _ in range(50):
        try:
            sock = socket.create_connection(("127.0.0.1", port))
            break
        except OSError:
            time.sleep(0.1)
    sock.send(json.dumps({"actionCount": 1, "observationCount": 2}).encode())
    time.sleep(0.3)  # keep the init handshake in its own TCP read
    x, v = 0.0, 0.0
    # initial observation for reset()
    sock.send(json.dumps({"observation": [x, v], "reward": 0.0,
                          "terminated": False, "truncated": False}).encode())
    steps = 0
    try:
        for _ in range(nr_steps):
            data = sock.recv(4096)
            if not data:
                break
            action = json.loads(data.decode())["action"][0]
            v = 0.9 * v + 0.1 * action
            x = x + 0.1 * v
            steps += 1
            truncated = steps % 50 == 0
            sock.send(json.dumps({
                "observation": [x, v], "reward": -abs(x - 1.0),
                "terminated": False, "truncated": truncated,
            }).encode())
            if truncated:
                x, v = 0.0, 0.0
    except OSError:
        pass
    sock.close()


def test_socket_env_round_trip():
    from rlx_tpu.environments.custom_interface.prototype.connection import SocketEnv

    port = 17531
    client = threading.Thread(target=fake_client, args=(port,), daemon=True)
    client.start()
    env = SocketEnv("127.0.0.1", port, horizon=50)
    assert env.single_observation_space.shape == (2,)
    assert env.single_action_space.shape == (1,)

    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for t in range(60):
        state = step(state, jnp.ones((1, 1)) * 0.5)
        if bool(state.truncated[0]):
            assert float(state.info["rollout/episode_length"][0]) == 50.0
            break
    else:
        raise AssertionError("no truncation seen")
    assert np.isfinite(np.asarray(state.observation)).all()
    env.close()
