"""FlashSAC: SAC with unit-norm nets, colored exploration, and reward
normalization.

Parity with `rl_x/algorithms/flashsac/flax_full_jit/flashsac.py`:
- hypersphere/unit-norm layers (`layers.py:8-116` — here the SimbaV2Encoder
  family, whose HyperDense kernels are re-normalized at every use, making
  the reference's explicit post-update parameter projection implicit);
- zeta-distributed action-noise repetition (`noise_repeat.py:5-25`): the
  exploration noise vector is held fixed for a Zipf(mu)-distributed number
  of steps, giving temporally-colored exploration;
- return-based reward normalizer (`reward_normalizer.py:4-38`);
- twin categorical (HL-Gauss) critics, policy delay.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlx_tpu.algorithms.flashsac.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.simbav2.tpu.simbav2 import SimbaV2
from rlx_tpu.ops import normalizers


def build_zeta_cdf(mu, max_n):
    ns = np.arange(1, max_n + 1, dtype=np.float32)
    pmf = ns ** (-mu)
    return np.cumsum(pmf / pmf.sum())


class FlashSAC(SimbaV2):
    def setup_states(self):
        a = self.config.algorithm
        self.zeta_cdf = jnp.asarray(build_zeta_cdf(a.noise_zeta_mu, a.noise_zeta_max_repeat))
        states = super().setup_states()
        states["noise"] = {
            "noise": jnp.zeros((self.nr_envs, self.action_dim)),
            "count": jnp.zeros((), jnp.int32),
            "n": jnp.ones((), jnp.int32),
        }
        return states

    def pre_act(self, states, key, step):
        noise_state = states["noise"]
        noise_key, n_key = jax.random.split(key)
        fresh_noise = jax.random.normal(noise_key, noise_state["noise"].shape)
        u = jax.random.uniform(n_key, ())
        fresh_n = (jnp.argmax((u < self.zeta_cdf).astype(jnp.int32)) + 1).astype(jnp.int32)
        reinit = (noise_state["count"] == 0) | (noise_state["count"] >= noise_state["n"])
        noise = jnp.where(reinit, fresh_noise, noise_state["noise"])
        n = jnp.where(reinit, fresh_n, noise_state["n"])
        count = jnp.where(reinit, 0, noise_state["count"]) + 1
        return {**states, "noise": {"noise": noise, "count": count, "n": n}}

    def act(self, states, observation, key, step):
        mean, log_std = self.policy.apply(
            states["policy"].params, self._norm(states, observation)
        )
        return jnp.tanh(mean + jnp.exp(log_std) * states["noise"]["noise"])

    def general_properties():
        return GeneralProperties
