"""DQN with HL-Gauss distributional regression.

Parity with `rl_x/algorithms/dqn_hl_gauss/flax/dqn_hl_gauss.py`: the Q-head
predicts a histogram over the value support per action; scalar TD targets
are smeared into bin probabilities with a Gaussian (histogram loss), trained
with cross-entropy; action selection uses the histogram expectation.
"""

import jax
import jax.numpy as jnp
import optax

from rlx_tpu.algorithms.c51.tpu.c51 import C51
from rlx_tpu.algorithms.dqn_hl_gauss.tpu.general_properties import GeneralProperties
from rlx_tpu.ops.distributional import hl_gauss_expectation, hl_gauss_targets


class DQNHLGauss(C51):
    """Shares C51's atoms-head plumbing; only the target construction and
    loss differ (scalar target -> Gaussian histogram)."""

    def expected_q(self, params, observation):
        logits = self.q_net.apply(params, observation)  # [B, actions, bins]
        return hl_gauss_expectation(logits, self.v_min, self.v_max)

    def update(self, states, batch, key, step):
        critic_state = states["critic"]

        next_expected = self.expected_q(critic_state.target_params, batch["next_observation"])
        y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * next_expected.max(axis=-1)
        target_dist = jax.lax.stop_gradient(
            hl_gauss_targets(y, self.v_min, self.v_max, self.nr_atoms)
        )

        def loss_fn(params):
            logits = self.q_net.apply(params, batch["observation"])
            action_logits = jnp.take_along_axis(
                logits, batch["action"][:, None, None], axis=1
            ).squeeze(1)
            log_probs = jax.nn.log_softmax(action_logits, axis=-1)
            loss = -(target_dist * log_probs).sum(-1).mean()
            expected = hl_gauss_expectation(action_logits, self.v_min, self.v_max)
            return loss, expected.mean()

        (q_loss, q_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(critic_state.params)

        updated = critic_state.apply_gradients(grads=grads)
        do_update = (step % self.update_every) == 0
        critic_state = jax.tree.map(
            lambda n, o: jnp.where(do_update, n, o),
            updated,
            critic_state.replace(step=critic_state.step + 1),
        )
        do_target = (step % self.target_update_every) == 0
        critic_state = critic_state.replace(
            target_params=jax.tree.map(
                lambda p, t: jnp.where(do_target, p, t),
                critic_state.params,
                critic_state.target_params,
            )
        )
        metrics = {
            "loss/q_loss": q_loss,
            "q_value/q_value": q_mean,
            "epsilon/epsilon": self.epsilon(step),
            "gradients/critic_grad_norm": optax.global_norm(grads),
        }
        return {"critic": critic_state}, metrics

    def general_properties():
        return GeneralProperties
