"""Shared test-mode episode collection.

Implements the reference's ``nr_test_episodes`` semantics
(`rl_x/algorithms/ppo/flax/ppo.py:469-485`): run the batched eval env and
harvest per-env returns at ACTUAL episode boundaries (terminated|truncated),
stopping once enough episodes completed — not fixed horizon-length windows.
"""

import numpy as np

from rlx_tpu.utils.logging import rlx_logger


def collect_test_returns(step_fn, carry, episodes, horizon, extract=lambda c: c):
    """Collect ``episodes`` completed-episode returns.

    ``step_fn(carry) -> carry`` advances the (jitted) eval rollout by one
    env step; ``extract(carry) -> env_state`` exposes the env state (for
    recurrent policies whose carry also holds the RNN state).  A safety cap
    of ``2 * episodes * horizon`` steps guards against envs that never
    terminate.
    """
    returns = []
    max_steps = max(2 * episodes * horizon, horizon)
    steps = 0
    while len(returns) < episodes and steps < max_steps:
        carry = step_fn(carry)
        steps += 1
        env_state = extract(carry)
        done = np.asarray(env_state.terminated | env_state.truncated)
        if done.any():
            episode_returns = np.asarray(env_state.info["rollout/episode_return"])
            for value in episode_returns[done]:
                returns.append(float(value))
                rlx_logger.info(f"eval/episode_return: {returns[-1]:.2f}")
                if len(returns) >= episodes:
                    break
    return returns[:episodes]
