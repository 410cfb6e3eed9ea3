"""Launcher for the REFERENCE's experiment entry with API-compat patches.

The reference targets an older gymnasium; this image ships gymnasium 1.x.
Patches are applied before the reference runner imports (no reference file
is modified):

- gym.logger.set_level was removed;
- vector envs default to NEXT_STEP autoreset in 1.x; the reference's
  algorithms assume the old SAME_STEP semantics and the old
  final_observation/final_info info keys.

Reference runs use nr_envs=1 (the reference's own default): its
AsyncVectorEnvWithSkipping subclass passes positional args that moved in
gymnasium 1.2, so only the SyncVectorEnv path is patched.
"""

import gymnasium

if not hasattr(gymnasium.logger, "set_level"):
    gymnasium.logger.set_level = lambda level: None

from gymnasium.vector import AutoresetMode, SyncVectorEnv

_orig_init = SyncVectorEnv.__init__


def _patched_init(self, env_fns, *args, **kwargs):
    kwargs.setdefault("autoreset_mode", AutoresetMode.SAME_STEP)
    _orig_init(self, env_fns, **kwargs)


_orig_step = SyncVectorEnv.step


def _patched_step(self, actions):
    import numpy as np

    observations, rewards, terminations, truncations, infos = _orig_step(self, actions)
    if "final_obs" in infos:  # restore the pre-1.x key names
        infos["final_observation"] = infos.pop("final_obs")
        infos["_final_observation"] = infos.pop("_final_obs")
    final_info = infos.get("final_info")
    if isinstance(final_info, dict):
        # 1.x column format {key: array} -> pre-1.x row format
        # (object array of per-env dicts, None where not done)
        mask = infos["_final_info"]
        rows = np.empty(len(mask), dtype=object)
        for i in range(len(mask)):
            if mask[i]:
                rows[i] = {
                    k: v[i] for k, v in final_info.items() if not k.startswith("_")
                }
        infos["final_info"] = rows
    return observations, rewards, terminations, truncations, infos


SyncVectorEnv.__init__ = _patched_init
SyncVectorEnv.step = _patched_step

# pre-1.x gymnasium allowed wrapping vector envs with gym.Wrapper (the
# reference's RLXInfo does); 1.x asserts isinstance(env, Env)
_orig_wrapper_init = gymnasium.Wrapper.__init__


def _patched_wrapper_init(self, env):
    self.env = env
    self._action_space = None
    self._observation_space = None
    self._metadata = None
    self._cached_spec = None


def _patched_wrapper_getattr(self, name):
    # pre-1.x attribute forwarding to the wrapped env
    if name.startswith("_"):
        raise AttributeError(name)
    return getattr(self.env, name)


gymnasium.Wrapper.__init__ = _patched_wrapper_init
gymnasium.Wrapper.__getattr__ = _patched_wrapper_getattr

# nr_envs > 1 routes to the reference's AsyncVectorEnvWithSkipping, whose
# super().__init__ positional args moved in gymnasium 1.2.  For overlay runs
# substitute SyncVectorEnv: with the reference's async_skip_percentage
# default of 0.0 the step semantics are identical (no env is ever skipped),
# and on this 2-core box async workers add no parallelism anyway.
import rl_x.environments.gym.mujoco.humanoid_v4.create_env as _ref_create_env


def _sync_no_skip(env_fns, async_skip_percentage=0.0):
    assert async_skip_percentage == 0.0, "Sync substitution requires skip=0"
    return SyncVectorEnv(env_fns)


_ref_create_env.AsyncVectorEnvWithSkipping = _sync_no_skip

from rl_x.runner.runner import Runner

if __name__ == "__main__":
    import faulthandler
    import os
    import sys

    if os.environ.get("REF_DEBUG_TRACE"):
        faulthandler.dump_traceback_later(60, repeat=True, file=sys.stderr)
    Runner().run()
