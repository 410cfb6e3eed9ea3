"""DQN as one fused XLA program (discrete control, flat or image obs).

Parity with `rl_x/algorithms/dqn/flax/dqn.py`: eps-greedy with a linear
schedule (epsilon_start -> epsilon_end over epsilon_decay_steps), replay,
TD(0) targets from a hard-updated target network every
``target_update_frequency`` env steps, gradient step every
``update_frequency`` env steps.  Frequencies are interpreted in env steps
and divided by nr_envs for the batched iteration counter.  Update gating is
branchless (select-apply) to stay scan-friendly.

DDQN subclasses override ``next_q_target`` only
(`rl_x/algorithms/ddqn/flax/ddqn.py` — online argmax, target evaluate).
"""

import jax
import jax.numpy as jnp
import optax

from rlx_tpu.algorithms.dqn.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.offpolicy import OffPolicyAlgorithm
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models.mlp import DiscreteQNet


class DQN(OffPolicyAlgorithm):
    def setup_states(self):
        a = self.config.algorithm
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

    def epsilon(self, step):
        fraction = jnp.minimum(step / self.epsilon_decay_iterations, 1.0)
        return self.epsilon_start + fraction * (self.epsilon_end - self.epsilon_start)

    def act(self, states, observation, key, step):
        greedy_key, explore_key, pick_key = jax.random.split(key, 3)
        q = self.q_net.apply(states["critic"].params, observation)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        random_action = jax.random.randint(
            explore_key, greedy.shape, 0, self.nr_actions, dtype=jnp.int32
        )
        explore = jax.random.uniform(pick_key, greedy.shape) < self.epsilon(step)
        return jnp.where(explore, random_action, greedy)

    def eval_act(self, states, observation):
        q = self.q_net.apply(states["critic"].params, observation)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    def next_q_target(self, states, batch):
        next_q = self.q_net.apply(states["critic"].target_params, batch["next_observation"])
        return jnp.max(next_q, axis=-1)

    def update(self, states, batch, key, step):
        critic_state = states["critic"]

        y = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * self.next_q_target(
            states, batch
        )

        def loss_fn(params):
            q = self.q_net.apply(params, batch["observation"])
            q_action = jnp.take_along_axis(q, batch["action"][:, None], axis=-1).squeeze(-1)
            return ((q_action - y) ** 2).mean(), q_action.mean()

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
