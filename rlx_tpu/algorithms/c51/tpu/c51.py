"""C51 categorical distributional DQN as one fused XLA program.

Parity with `rl_x/algorithms/c51/flax/c51.py`: per-action atom logits over a
fixed support [v_min, v_max], greedy action by expected value, target
distribution via the categorical projection, cross-entropy loss.
"""

import jax
import jax.numpy as jnp
import optax

from rlx_tpu.algorithms.c51.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.dqn.tpu.dqn import DQN
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models.mlp import DiscreteQNet
from rlx_tpu.ops.distributional import categorical_projection_dense as categorical_projection


class C51(DQN):
    def setup_states(self):
        a = self.config.algorithm
        self.v_min = a.v_min
        self.v_max = a.v_max
        self.nr_atoms = a.nr_atoms
        self.atoms = jnp.linspace(self.v_min, self.v_max, self.nr_atoms)
        self.key, critic_key = jax.random.split(self.key)
        self.epsilon_start = a.epsilon_start
        self.epsilon_end = a.epsilon_end
        self.epsilon_decay_iterations = max(int(a.epsilon_decay_steps) // self.nr_envs, 1)
        self.update_every = max(int(a.update_frequency) // self.nr_envs, 1)
        self.target_update_every = max(int(a.target_update_frequency) // self.nr_envs, 1)

        self.q_net = DiscreteQNet(
            nr_actions=self.nr_actions,
            hidden_sizes=tuple(a.critic_hidden_sizes),
            activation=a.activation,
            output_dim_per_action=self.nr_atoms,
        )
        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        return {
            "critic": RLTrainState.create(
                apply_fn=self.q_net.apply,
                params=self.q_net.init(critic_key, dummy_obs),
                target_params=self.q_net.init(critic_key, dummy_obs),
                tx=optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate),
            ),
        }

    def expected_q(self, params, observation):
        logits = self.q_net.apply(params, observation)  # [B, actions, atoms]
        probs = jax.nn.softmax(logits, axis=-1)
        return (probs * self.atoms).sum(-1)

    def act(self, states, observation, key, step):
        greedy_key, explore_key, pick_key = jax.random.split(key, 3)
        greedy = jnp.argmax(self.expected_q(states["critic"].params, observation), axis=-1).astype(jnp.int32)
        random_action = jax.random.randint(explore_key, greedy.shape, 0, self.nr_actions, dtype=jnp.int32)
        explore = jax.random.uniform(pick_key, greedy.shape) < self.epsilon(step)
        return jnp.where(explore, random_action, greedy)

    def eval_act(self, states, observation):
        return jnp.argmax(self.expected_q(states["critic"].params, observation), axis=-1).astype(jnp.int32)

    def update(self, states, batch, key, step):
        critic_state = states["critic"]

        # target distribution
        next_logits = self.q_net.apply(critic_state.target_params, batch["next_observation"])
        next_probs = jax.nn.softmax(next_logits, axis=-1)
        next_expected = (next_probs * self.atoms).sum(-1)
        best_action = jnp.argmax(next_expected, axis=-1)
        best_probs = jnp.take_along_axis(
            next_probs, best_action[:, None, None], axis=1
        ).squeeze(1)  # [B, atoms]

        target_z = batch["reward"][:, None] + self.gamma * (1.0 - batch["terminated"][:, None]) * self.atoms[None]
        target_dist = categorical_projection(target_z, best_probs, self.v_min, self.v_max, self.nr_atoms)
        target_dist = jax.lax.stop_gradient(target_dist)

        def loss_fn(params):
            logits = self.q_net.apply(params, batch["observation"])  # [B, A, atoms]
            action_logits = jnp.take_along_axis(
                logits, batch["action"][:, None, None], axis=1
            ).squeeze(1)
            log_probs = jax.nn.log_softmax(action_logits, axis=-1)
            loss = -(target_dist * log_probs).sum(-1).mean()
            expected = (jax.nn.softmax(action_logits, axis=-1) * self.atoms).sum(-1)
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
