"""ctypes bindings + device-protocol adapter for the native env batcher.

The C++ library (envbatch.cpp) is compiled lazily on first use with g++ and
cached next to the source; bindings use ctypes (no pybind11 in this image).
``NativeEnvBatch`` presents the same device-env protocol as HostGymEnv —
ordered io_callbacks step the C++ thread pool from inside the fused program.
"""

import ctypes
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.environments.gym.host_bridge import HostEnvState
from rlx_tpu.environments.spaces import BoxSpace, DiscreteSpace

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_NATIVE_DIR, "libenvbatch.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "envbatch.cpp")

_lib = None


def _compile(cmd):
    """Run a g++ invocation, surfacing the compiler diagnostics on failure
    (check=True alone would swallow the captured stderr)."""
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        stderr = (e.stderr or b"").decode(errors="replace")
        raise RuntimeError(
            f"native batcher compile failed ({' '.join(cmd)}):\n{stderr}"
        ) from e


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO_PATH)) or (
        os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
    ):
        _compile(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _SO_PATH, _SRC_PATH, "-lpthread"],
        )
    lib = ctypes.CDLL(_SO_PATH)
    lib.envbatch_create.restype = ctypes.c_void_p
    lib.envbatch_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.envbatch_obs_dim.restype = ctypes.c_int
    lib.envbatch_obs_dim.argtypes = [ctypes.c_void_p]
    lib.envbatch_horizon.restype = ctypes.c_int
    lib.envbatch_horizon.argtypes = [ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.envbatch_reset.argtypes = [ctypes.c_void_p, f32p]
    lib.envbatch_step.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, f32p, u8p, u8p, f32p]
    lib.envbatch_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


ENV_SPECS = {
    "pendulum": dict(discrete=False, act_dim=1, act_low=-2.0, act_high=2.0),
    "cart_pole": dict(discrete=True, nr_actions=2),
}


class NativeEnvBatch:
    """C++-vectorized host environment with the device-env protocol."""

    def __init__(self, env_id, nr_envs, seed=0, nr_threads=0):
        spec = ENV_SPECS[env_id]
        self._lib = _load_library()
        self._handle = self._lib.envbatch_create(
            env_id.encode(), nr_envs, seed, nr_threads
        )
        if not self._handle:
            raise ValueError(f"unknown native env '{env_id}'")
        self.env_id = env_id
        self.nr_envs = nr_envs
        self.horizon = self._lib.envbatch_horizon(self._handle)
        self._obs_dim = self._lib.envbatch_obs_dim(self._handle)
        self._discrete = spec["discrete"]
        self.single_observation_space = BoxSpace(
            low=-np.inf, high=np.inf, shape=(self._obs_dim,)
        )
        if self._discrete:
            self.single_action_space = DiscreteSpace(spec["nr_actions"])
        else:
            self.single_action_space = BoxSpace(
                low=spec["act_low"], high=spec["act_high"], shape=(spec["act_dim"],)
            )

    # host side ------------------------------------------------------------
    def _host_reset(self, _seed):
        obs = np.empty((self.nr_envs, self._obs_dim), np.float32)
        self._lib.envbatch_reset(self._handle, obs)
        return obs

    def _host_step(self, actions):
        actions = np.ascontiguousarray(np.asarray(actions, np.float32).reshape(self.nr_envs, -1))
        obs = np.empty((self.nr_envs, self._obs_dim), np.float32)
        final_obs = np.empty_like(obs)
        reward = np.empty(self.nr_envs, np.float32)
        term = np.empty(self.nr_envs, np.uint8)
        trunc = np.empty(self.nr_envs, np.uint8)
        stats = np.empty((self.nr_envs, 2), np.float32)
        self._lib.envbatch_step(self._handle, actions, obs, final_obs, reward, term, trunc, stats)
        return obs, final_obs, reward, term.astype(bool), trunc.astype(bool), stats

    # device side ----------------------------------------------------------
    def reset(self, key, eval_mode=False):
        import jax.experimental

        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        observation = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self.nr_envs, self._obs_dim), jnp.float32),
            seed,
            ordered=True,
        )
        zeros = jnp.zeros(self.nr_envs)
        falses = jnp.zeros(self.nr_envs, bool)
        return HostEnvState(
            observation=observation,
            final_observation=observation,
            reward=zeros,
            terminated=falses,
            truncated=falses,
            info={"rollout/episode_return": zeros, "rollout/episode_length": zeros},
            key=key,
            eval_mode=eval_mode,
        )

    def step(self, state, action):
        import jax.experimental

        action = action.astype(jnp.float32)
        out_specs = (
            jax.ShapeDtypeStruct((self.nr_envs, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs, self._obs_dim), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs,), jnp.float32),
            jax.ShapeDtypeStruct((self.nr_envs,), bool),
            jax.ShapeDtypeStruct((self.nr_envs,), bool),
            jax.ShapeDtypeStruct((self.nr_envs, 2), jnp.float32),
        )
        observation, final_observation, reward, terminated, truncated, stats = (
            jax.experimental.io_callback(self._host_step, out_specs, action, ordered=True)
        )
        return state.replace(
            observation=observation,
            final_observation=final_observation,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={
                "rollout/episode_return": stats[:, 0],
                "rollout/episode_length": stats[:, 1],
            },
        )

    def close(self):
        if self._handle:
            self._lib.envbatch_destroy(self._handle)
            self._handle = None


# ---------------------------------------------------------------- mujoco

_MJ_SO_PATH = os.path.join(_NATIVE_DIR, "libenvbatch_mujoco.so")
_MJ_SRC_PATH = os.path.join(_NATIVE_DIR, "envbatch_mujoco.cpp")

_mj_lib = None


def _load_mujoco_library():
    """Compile/load the MuJoCo batcher against the installed mujoco wheel's
    C library (include/ + libmujoco.so.<ver> ship inside the package)."""
    global _mj_lib
    if _mj_lib is not None:
        return _mj_lib
    import mujoco

    pkg_dir = os.path.dirname(os.path.abspath(mujoco.__file__))
    include_dir = os.path.join(pkg_dir, "include")
    libname = next(
        f for f in sorted(os.listdir(pkg_dir)) if f.startswith("libmujoco.so")
    )
    if (not os.path.exists(_MJ_SO_PATH)) or (
        os.path.getmtime(_MJ_SO_PATH) < os.path.getmtime(_MJ_SRC_PATH)
    ):
        _compile(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             f"-I{include_dir}", "-o", _MJ_SO_PATH, _MJ_SRC_PATH,
             f"-L{pkg_dir}", f"-l:{libname}", f"-Wl,-rpath,{pkg_dir}",
             "-lpthread"],
        )
    lib = ctypes.CDLL(_MJ_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.mjbatch_create.restype = ctypes.c_void_p
    lib.mjbatch_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    for name in ["mjbatch_obs_dim", "mjbatch_act_dim", "mjbatch_horizon"]:
        getattr(lib, name).restype = ctypes.c_int
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.mjbatch_ctrl_range.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.mjbatch_reset.argtypes = [ctypes.c_void_p, f32p]
    lib.mjbatch_step.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, f32p, u8p, u8p, f32p]
    lib.mjbatch_set_state.argtypes = [ctypes.c_void_p, ctypes.c_int, f64p, f64p]
    lib.mjbatch_get_state.argtypes = [ctypes.c_void_p, ctypes.c_int, f64p, f64p]
    lib.mjbatch_destroy.argtypes = [ctypes.c_void_p]
    _mj_lib = lib
    return lib


def _gym_asset_path(task):
    """MJCF shipped with gymnasium (same files Gym's own v5 envs load —
    walker2d's v5 registration points at the revised walker2d_v5.xml)."""
    import gymnasium.envs.mujoco as gm

    assets = os.path.join(os.path.dirname(os.path.abspath(gm.__file__)), "assets")
    filename = "walker2d_v5.xml" if task == "walker2d" else f"{task}.xml"
    return os.path.join(assets, filename)


class MujocoNativeEnvBatch(NativeEnvBatch):
    """C++-vectorized Gym MuJoCo v5 tasks (hopper/half_cheetah/walker2d)."""

    def __init__(self, task, nr_envs, seed=0, nr_threads=0, xml_path=None):
        self._lib = _load_mujoco_library()
        if xml_path is None:
            xml_path = _gym_asset_path(task)
        self._handle = self._lib.mjbatch_create(
            xml_path.encode(), task.encode(), nr_envs, seed, nr_threads
        )
        if not self._handle:
            raise ValueError(f"unknown native mujoco task '{task}' / bad xml {xml_path}")
        self.env_id = task
        self.nr_envs = nr_envs
        self.horizon = self._lib.mjbatch_horizon(self._handle)
        self._obs_dim = self._lib.mjbatch_obs_dim(self._handle)
        self._discrete = False
        act_dim = self._lib.mjbatch_act_dim(self._handle)
        lo = np.empty(act_dim, np.float32)
        hi = np.empty(act_dim, np.float32)
        self._lib.mjbatch_ctrl_range(self._handle, lo, hi)
        self.single_observation_space = BoxSpace(
            low=-np.inf, high=np.inf, shape=(self._obs_dim,)
        )
        self.single_action_space = BoxSpace(low=lo, high=hi, shape=(act_dim,))

    # host side (device-side protocol + io_callbacks inherited) -------------
    def _host_reset(self, _seed):
        obs = np.empty((self.nr_envs, self._obs_dim), np.float32)
        self._lib.mjbatch_reset(self._handle, obs)
        return obs

    def _host_step(self, actions):
        actions = np.ascontiguousarray(
            np.asarray(actions, np.float32).reshape(self.nr_envs, -1)
        )
        obs = np.empty((self.nr_envs, self._obs_dim), np.float32)
        final_obs = np.empty_like(obs)
        reward = np.empty(self.nr_envs, np.float32)
        term = np.empty(self.nr_envs, np.uint8)
        trunc = np.empty(self.nr_envs, np.uint8)
        stats = np.empty((self.nr_envs, 2), np.float32)
        self._lib.mjbatch_step(
            self._handle, actions, obs, final_obs, reward, term, trunc, stats
        )
        return obs, final_obs, reward, term.astype(bool), trunc.astype(bool), stats

    # test hooks -------------------------------------------------------------
    def set_state(self, env_index, qpos, qvel):
        self._lib.mjbatch_set_state(
            self._handle, env_index,
            np.ascontiguousarray(qpos, np.float64),
            np.ascontiguousarray(qvel, np.float64),
        )

    def get_state(self, env_index, nq, nv):
        qpos = np.empty(nq, np.float64)
        qvel = np.empty(nv, np.float64)
        self._lib.mjbatch_get_state(self._handle, env_index, qpos, qvel)
        return qpos, qvel

    def close(self):
        if self._handle:
            self._lib.mjbatch_destroy(self._handle)
            self._handle = None


# ---------------------------------------------------------------- dm_control

_DMC_SO_PATH = os.path.join(_NATIVE_DIR, "libenvbatch_dmc.so")
_DMC_SRC_PATH = os.path.join(_NATIVE_DIR, "envbatch_dmc.cpp")

_dmc_lib = None


def _load_dmc_library():
    global _dmc_lib
    if _dmc_lib is not None:
        return _dmc_lib
    import mujoco

    pkg_dir = os.path.dirname(os.path.abspath(mujoco.__file__))
    include_dir = os.path.join(pkg_dir, "include")
    libname = next(
        f for f in sorted(os.listdir(pkg_dir)) if f.startswith("libmujoco.so")
    )
    if (not os.path.exists(_DMC_SO_PATH)) or (
        os.path.getmtime(_DMC_SO_PATH) < os.path.getmtime(_DMC_SRC_PATH)
    ):
        _compile(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             f"-I{include_dir}", "-o", _DMC_SO_PATH, _DMC_SRC_PATH,
             f"-L{pkg_dir}", f"-l:{libname}", f"-Wl,-rpath,{pkg_dir}",
             "-lpthread"],
        )
    lib = ctypes.CDLL(_DMC_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.dmcbatch_create.restype = ctypes.c_void_p
    lib.dmcbatch_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    for name in ["dmcbatch_obs_dim", "dmcbatch_act_dim", "dmcbatch_horizon"]:
        getattr(lib, name).restype = ctypes.c_int
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.dmcbatch_ctrl_range.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.dmcbatch_reset.argtypes = [ctypes.c_void_p, f32p]
    lib.dmcbatch_step.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, f32p, u8p, u8p, f32p]
    lib.dmcbatch_set_state.argtypes = [ctypes.c_void_p, ctypes.c_int, f64p, f64p]
    lib.dmcbatch_get_state.argtypes = [ctypes.c_void_p, ctypes.c_int, f64p, f64p]
    lib.dmcbatch_destroy.argtypes = [ctypes.c_void_p]
    _dmc_lib = lib
    return lib


def _dmc_model_path(domain):
    """Compile the dm_control suite model (xml + assets from the installed
    package) to a binary .mjb the C++ side can load without the asset dict."""
    import mujoco
    from dm_control.suite import common

    path = os.path.join(_NATIVE_DIR, f"dmc_{domain}.mjb")
    # common is dm_control/suite/common/; the task xmls live one level up
    suite_dir = os.path.dirname(os.path.dirname(os.path.abspath(common.__file__)))
    xml_path = os.path.join(suite_dir, f"{domain}.xml")
    if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(xml_path):
        return path
    xml = common.read_model(f"{domain}.xml")
    if isinstance(xml, bytes):
        xml = xml.decode()
    model = mujoco.MjModel.from_xml_string(xml, common.ASSETS)
    mujoco.mj_saveModel(model, path, None)
    return path


class DMCNativeEnvBatch(MujocoNativeEnvBatch):
    """C++-vectorized dm_control suite tasks (cheetah_run, walker_walk,
    walker_run) with the device-env protocol — the in-repo equivalent of the
    reference's EnvPool dmc track
    (`rl_x/environments/envpool/dmc/humanoid_run_v1/create_env.py`)."""

    def __init__(self, task, nr_envs, seed=0, nr_threads=0):
        self._lib = _load_dmc_library()
        domain = task.split("_", 1)[0]
        mjb_path = _dmc_model_path(domain)
        self._handle = self._lib.dmcbatch_create(
            mjb_path.encode(), task.encode(), nr_envs, seed, nr_threads
        )
        if not self._handle:
            raise ValueError(f"unknown native dmc task '{task}'")
        self.env_id = task
        self.nr_envs = nr_envs
        self.horizon = self._lib.dmcbatch_horizon(self._handle)
        self._obs_dim = self._lib.dmcbatch_obs_dim(self._handle)
        self._discrete = False
        act_dim = self._lib.dmcbatch_act_dim(self._handle)
        lo = np.empty(act_dim, np.float32)
        hi = np.empty(act_dim, np.float32)
        self._lib.dmcbatch_ctrl_range(self._handle, lo, hi)
        self.single_observation_space = BoxSpace(
            low=-np.inf, high=np.inf, shape=(self._obs_dim,)
        )
        self.single_action_space = BoxSpace(low=lo, high=hi, shape=(act_dim,))

    def _host_reset(self, _seed):
        obs = np.empty((self.nr_envs, self._obs_dim), np.float32)
        self._lib.dmcbatch_reset(self._handle, obs)
        return obs

    def _host_step(self, actions):
        actions = np.ascontiguousarray(
            np.asarray(actions, np.float32).reshape(self.nr_envs, -1)
        )
        obs = np.empty((self.nr_envs, self._obs_dim), np.float32)
        final_obs = np.empty_like(obs)
        reward = np.empty(self.nr_envs, np.float32)
        term = np.empty(self.nr_envs, np.uint8)
        trunc = np.empty(self.nr_envs, np.uint8)
        stats = np.empty((self.nr_envs, 2), np.float32)
        self._lib.dmcbatch_step(
            self._handle, actions, obs, final_obs, reward, term, trunc, stats
        )
        return obs, final_obs, reward, term.astype(bool), trunc.astype(bool), stats

    def set_state(self, env_index, qpos, qvel):
        self._lib.dmcbatch_set_state(
            self._handle, env_index,
            np.ascontiguousarray(qpos, np.float64),
            np.ascontiguousarray(qvel, np.float64),
        )

    def get_state(self, env_index, nq, nv):
        qpos = np.empty(nq, np.float64)
        qvel = np.empty(nv, np.float64)
        self._lib.dmcbatch_get_state(self._handle, env_index, qpos, qvel)
        return qpos, qvel

    def close(self):
        if self._handle:
            self._lib.dmcbatch_destroy(self._handle)
            self._handle = None
