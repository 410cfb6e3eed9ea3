"""TCP/JSON bridge for external simulators and real robots.

Wire-protocol parity with the reference
(`rl_x/environments/custom_interface/prototype/connection.py:5-46`), so
existing clients work unchanged:
- client connects and sends ``{"actionCount": A, "observationCount": O}``;
- server sends ``{"action": [...]}`` per step;
- client replies ``{"observation": [...], "reward": r, "terminated": b,
  "truncated": b, "extraValueNames": [...], "extraValues": [...]}``.
"""

import json
import socket

import numpy as np


class Connection:
    def __init__(self, port):
        self.port = port
        self.client = None

    def start(self, ip):
        server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        server.bind((ip, self.port))
        print(f"Waiting for client to connect on port {self.port}...", flush=True)
        server.listen(1)
        self.client, _ = server.accept()
        self._server = server

        init = json.loads(self.client.recv(2048).decode())
        self.action_count = init["actionCount"]
        self.observation_count = init["observationCount"]
        return self.action_count, self.observation_count

    def send(self, action):
        values = action.tolist() if hasattr(action, "tolist") else list(action)
        self.client.send(json.dumps({"action": values}).encode())

    def recv(self):
        try:
            reaction = json.loads(self.client.recv(4096).decode())
        except json.JSONDecodeError:
            reaction = {
                "observation": [0.0] * self.observation_count,
                "reward": 0.0,
                "terminated": False,
                "truncated": False,
            }
        return reaction

    def close(self):
        if self.client is not None:
            self.client.close()
            self._server.close()
            self.client = None


class SocketEnv:
    """Single external env over TCP, presenting the device-env protocol
    (nr_envs == 1; batched arrays of size 1 flow through io_callback)."""

    def __init__(self, ip, port, horizon=1000):
        from rlx_tpu.environments.spaces import BoxSpace

        self.connection = Connection(port)
        action_count, observation_count = self.connection.start(ip)
        self.nr_envs = 1
        self.horizon = horizon
        self._obs_dim = observation_count
        self.single_action_space = BoxSpace(low=-1.0, high=1.0, shape=(action_count,))
        self.single_observation_space = BoxSpace(low=-1.0, high=1.0, shape=(observation_count,))
        self._episode_return = 0.0
        self._episode_length = 0
        self._last_stats = np.zeros(2, np.float32)

    def _host_reset(self, _seed):
        reaction = self.connection.recv()
        self._episode_return = 0.0
        self._episode_length = 0
        return np.asarray(reaction["observation"], np.float32)[None]

    def _host_step(self, action):
        self.connection.send(np.asarray(action)[0])
        reaction = self.connection.recv()
        obs = np.asarray(reaction["observation"], np.float32)
        reward = float(reaction["reward"])
        terminated = bool(reaction["terminated"])
        truncated = bool(reaction["truncated"])
        self._episode_return += reward
        self._episode_length += 1
        if terminated or truncated:
            self._last_stats[:] = (self._episode_return, self._episode_length)
            self._episode_return = 0.0
            self._episode_length = 0
        return (
            obs[None], obs[None],
            np.asarray([reward], np.float32),
            np.asarray([terminated]),
            np.asarray([truncated]),
            self._last_stats[None].copy(),
        )

    def reset(self, key, eval_mode=False):
        import jax
        import jax.experimental
        import jax.numpy as jnp

        from rlx_tpu.environments.gym.host_bridge import HostEnvState

        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        observation = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((1, self._obs_dim), jnp.float32),
            seed, ordered=True,
        )
        zeros = jnp.zeros(1)
        falses = jnp.zeros(1, bool)
        return HostEnvState(
            observation=observation, final_observation=observation,
            reward=zeros, terminated=falses, truncated=falses,
            info={"rollout/episode_return": zeros, "rollout/episode_length": zeros},
            key=key, eval_mode=eval_mode,
        )

    def step(self, state, action):
        import jax
        import jax.experimental
        import jax.numpy as jnp

        out_specs = (
            jax.ShapeDtypeStruct((1, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((1,), bool),
            jax.ShapeDtypeStruct((1,), bool),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        )
        observation, final_observation, reward, terminated, truncated, stats = (
            jax.experimental.io_callback(self._host_step, out_specs, action, ordered=True)
        )
        return state.replace(
            observation=observation, final_observation=final_observation,
            reward=reward, terminated=terminated, truncated=truncated,
            info={"rollout/episode_return": stats[:, 0], "rollout/episode_length": stats[:, 1]},
        )

    def close(self):
        self.connection.close()
