"""CrossQ: SAC without target networks, stabilized by BatchRenorm.

Parity with `rl_x/algorithms/crossq/flax/crossq.py`: twin critics with
BatchRenorm before every Dense (`crossq/flax/critic.py:36-50`), the joint
(s, s') batch passed through the critic in ONE train-mode forward
(`crossq.py:171-172`) so both halves share batch statistics, no target
params, delayed policy updates (policy_delay=3), wide critics (2048).

The critic TrainState carries the 'batch_stats' collection; the policy is a
BatchRenorm-free squashed Gaussian evaluated with running statistics.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from flax import core, struct
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.crossq.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.sac.tpu.sac import SAC
from rlx_tpu.models import distributions as D
from rlx_tpu.models.layers import BatchRenorm


class BNTrainState(TrainState):
    batch_stats: core.FrozenDict = struct.field(pytree_node=True, default=None)


class CrossQCritic(nn.Module):
    hidden_sizes: Sequence[int]
    momentum: float = 0.99
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action, train: bool):
        if self.observation_indices is not None:
            obs = obs[..., jnp.asarray(self.observation_indices)]
        x = jnp.concatenate([obs, action], axis=-1)
        x = BatchRenorm(momentum=self.momentum)(x, use_running_average=not train)
        for size in self.hidden_sizes:
            x = nn.Dense(size)(x)
            x = BatchRenorm(momentum=self.momentum)(x, use_running_average=not train)
            x = nn.relu(x)
        return nn.Dense(1)(x)


class CrossQVectorCritic(nn.Module):
    hidden_sizes: Sequence[int]
    nr_critics: int = 2
    momentum: float = 0.99
    observation_indices: Sequence[int] = None

    @nn.compact
    def __call__(self, obs, action, train: bool):
        ensemble = nn.vmap(
            CrossQCritic,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            in_axes=(None, None, None),
            out_axes=0,
            axis_size=self.nr_critics,
        )
        return ensemble(self.hidden_sizes, self.momentum, self.observation_indices)(
            obs, action, train
        )


class CrossQ(SAC):
    def setup_states(self):
        a = self.config.algorithm
        self.policy_delay = a.policy_delay
        states = super().setup_states()

        # rebuild the critic with batch stats; no target params
        self.key, critic_key = jax.random.split(self.key)
        self.critic = CrossQVectorCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=a.nr_critics,
            momentum=a.batch_renorm_momentum,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )
        dummy_obs = jnp.zeros((2,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((2, self.action_dim), jnp.float32)
        variables = self.critic.init(critic_key, dummy_obs, dummy_action, True)
        states["critic"] = BNTrainState.create(
            apply_fn=self.critic.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=optax.inject_hyperparams(optax.adam)(
                learning_rate=self.learning_rate, b1=0.5
            ),
        )
        return states

    def update(self, states, batch, key, step):
        policy_state, critic_state, alpha_state = states["policy"], states["critic"], states["alpha"]
        target_key, current_key = jax.random.split(key)

        next_action, next_log_prob = D.tanh_gaussian_sample_and_log_prob(
            target_key, *self.policy.apply(policy_state.params, batch["next_observation"])
        )
        alpha = stop_gradient(self.entropy_coefficient.apply(alpha_state.params))

        def critic_loss_fn(critic_params):
            # THE CrossQ trick: one joint train-mode forward over (s, s')
            joint_obs = jnp.concatenate([batch["observation"], batch["next_observation"]], axis=0)
            joint_action = jnp.concatenate([batch["action"], stop_gradient(next_action)], axis=0)
            q_joint, mutated = self.critic.apply(
                {"params": critic_params, "batch_stats": critic_state.batch_stats},
                joint_obs, joint_action, True,
                mutable=["batch_stats"],
            )
            q_joint = q_joint.squeeze(-1)  # [n, 2B]
            B = batch["observation"].shape[0]
            q, q_next = q_joint[:, :B], q_joint[:, B:]
            min_next_q = stop_gradient(jnp.min(q_next, axis=0))
            y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * (
                min_next_q - alpha * next_log_prob
            )
            q_loss = ((q - stop_gradient(y)[None, :]) ** 2).mean()
            return q_loss, (mutated["batch_stats"], q.mean())

        (q_loss, (new_batch_stats, q_mean)), critic_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(critic_state.params)
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        critic_state = critic_state.replace(batch_stats=new_batch_stats)

        def policy_loss_fn(policy_params, alpha_params):
            alpha_with_grad = self.entropy_coefficient.apply(alpha_params)
            current_action, current_log_prob = D.tanh_gaussian_sample_and_log_prob(
                current_key, *self.policy.apply(policy_params, batch["observation"])
            )
            entropy = stop_gradient(-current_log_prob)
            q_pi = self.critic.apply(
                {"params": stop_gradient(critic_state.params),
                 "batch_stats": critic_state.batch_stats},
                batch["observation"], current_action, False,
            ).squeeze(-1)
            min_q_pi = jnp.min(q_pi, axis=0)
            policy_loss = (stop_gradient(alpha_with_grad) * current_log_prob - min_q_pi).mean()
            alpha_loss = (alpha_with_grad * (entropy - self.target_entropy)).mean()
            return policy_loss + alpha_loss, (policy_loss, alpha_loss, entropy.mean())

        (_, (policy_loss, alpha_loss, entropy_mean)), (policy_grads, alpha_grads) = (
            jax.value_and_grad(policy_loss_fn, argnums=(0, 1), has_aux=True)(
                policy_state.params, alpha_state.params
            )
        )
        updated_policy = policy_state.apply_gradients(grads=policy_grads)
        updated_alpha = alpha_state.apply_gradients(grads=alpha_grads)
        do_update = (step % self.policy_delay) == 0
        select = lambda new, old: jax.tree.map(lambda n, o: jnp.where(do_update, n, o), new, old)
        policy_state = select(updated_policy, policy_state.replace(step=policy_state.step + 1))
        alpha_state = select(updated_alpha, alpha_state)

        metrics = {
            "loss/q_loss": q_loss,
            "loss/policy_loss": policy_loss,
            "loss/entropy_loss": alpha_loss,
            "entropy/entropy": entropy_mean,
            "entropy/alpha": self.entropy_coefficient.apply(alpha_state.params),
            "q_value/q_value": q_mean,
            "lr/learning_rate": policy_state.opt_state.hyperparams["learning_rate"],
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return {"policy": policy_state, "critic": critic_state, "alpha": alpha_state}, metrics

    def checkpoint_tree(self, states):
        tree = super().checkpoint_tree(states)
        tree["critic_batch_stats"] = states["critic"].batch_stats
        return tree

    def restore_from_tree(self, restored):
        super().restore_from_tree(restored)
        self.states["critic"] = self.states["critic"].replace(
            batch_stats=restored["critic_batch_stats"]
        )

    def general_properties():
        return GeneralProperties
