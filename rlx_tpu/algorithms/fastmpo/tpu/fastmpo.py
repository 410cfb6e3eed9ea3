"""FastMPO: MPO E/M machinery on the FastSAC/FastTD3 training recipe.

Parity with `rl_x/algorithms/fastmpo/flax_full_jit/fastmpo.py`:

- data collected with the **target** policy by default
  (`collect_data_with_online_policy=False`, `fastmpo.py:236-238`), raw
  unclipped Gaussian actions (`action_clipping=False`,
  `action_rescaling="none"`);
- per env step: ``nr_policy_updates_per_step`` policy/dual updates, each
  preceded by ``nr_critic_updates_per_policy_update`` critic updates, every
  update on a fresh uniformly-sampled batch (`fastmpo.py:572-627`);
- **soft** target updates after every gradient step — critic tau 0.125,
  policy tau 0.3 (`fastmpo.py:593`, `:625`) — instead of MPO's periodic
  hard refreshes;
- AdamW (weight decay 1e-3, beta2 0.95) with global-norm clipping
  (`fastmpo.py:155-180`);
- dual categorical critic, 101 atoms over [-20, 20], mean aggregation in
  the E-step unless ``clipped_double_q_learning`` (`fastmpo.py:340-345`);
- running observation normalizer updated from the **sampled batches**
  (states and next states), not from the rollout stream
  (`fastmpo.py:545-567`);
- FastSAC-scale networks: policy 512-256-128 / critic 768-384-192, SiLU +
  LayerNorm after every Dense, zero-init heads, scaled softplus std head
  (`fastmpo/flax_full_jit/policy.py:42-67`, `critic.py:25-43`);
- replay sized per env (`buffer_size_per_env`), learning starts measured
  in env iterations (`learning_starts` x nr_envs).

TPU redesign notes: the reference vmaps the per-sample loss; here the loss
is batched directly (same math, one big MXU matmul per layer), and the
sampled mega-batch [nr_updates, batch, ...] is drawn with a single gather
so the unrolled update loop reuses it without re-touching HBM.
"""

import jax
import jax.numpy as jnp

from rlx_tpu.algorithms.fastmpo.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.mpo.tpu.mpo import MPO, MPOGaussianPolicy
from rlx_tpu.models.mlp import VectorQCritic
from rlx_tpu.ops import normalizers
from rlx_tpu.ops import replay_buffer as rb
import optax


NETWORK_SHAPES = {
    # network type -> (policy_hidden, critic_hidden, activation, ln_all)
    "fastsac": ((512, 256, 128), (768, 384, 192), "silu", True),
    "fasttd3": ((512, 256, 128), (1024, 512, 256), "relu", False),
}


class FastMPO(MPO):
    def setup_states(self):
        a = self.config.algorithm
        self.critic_tau = a.critic_tau
        self.policy_tau = a.policy_tau
        self.collect_online = a.collect_data_with_online_policy
        self.nr_critic_updates_per_policy_update = a.nr_critic_updates_per_policy_update
        self.nr_policy_updates_per_step = a.nr_policy_updates_per_step
        self.nr_critic_updates_per_step = (
            self.nr_policy_updates_per_step * self.nr_critic_updates_per_policy_update
        )
        return super().setup_states()

    def _build_policy(self, a):
        if a.policy_network_type not in NETWORK_SHAPES:
            return super()._build_policy(a)
        hidden, _, activation, ln_all = NETWORK_SHAPES[a.policy_network_type]
        return MPOGaussianPolicy(
            action_dim=self.action_dim,
            hidden_sizes=hidden,
            activation=activation,
            layer_norm=False,
            layer_norm_all=ln_all,
            init_scale=a.policy_init_scale,
            min_scale=a.policy_min_scale,
            zero_init_heads=True,
            scaled_std_head=True,
            orthogonal_init=False,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def _build_critic(self, a):
        if a.critic_network_type not in NETWORK_SHAPES:
            return super()._build_critic(a)
        _, hidden, activation, ln_all = NETWORK_SHAPES[a.critic_network_type]
        return VectorQCritic(
            hidden_sizes=hidden,
            nr_critics=self.nr_critics,
            activation=activation,
            layer_norm=False,
            layer_norm_all=ln_all,
            output_dim=self.nr_atoms,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    # Data is collected with the target policy; normalizer updates happen in
    # the update step from sampled batches, not here.
    def observe_transition(self, states, observation, env_state):
        return states

    def act(self, states, observation, key, step):
        params = (
            states["policy"].params if self.collect_online else states["policy"].target_params
        )
        mean, std = self.policy.apply(params, self._norm(states, observation))
        return mean + std * jax.random.normal(key, mean.shape)

    def eval_act(self, states, observation):
        mean, _ = self.policy.apply(states["policy"].params, self._norm(states, observation))
        return mean

    def update_with_buffer(self, states, buffer, key, step):
        sample_key, update_key = jax.random.split(key)
        n_up = self.nr_critic_updates_per_step
        total = n_up * self.batch_size

        if self.n_step > 1:
            batch = rb.sample_nstep(
                buffer, sample_key, total, self.n_step, self.gamma,
                shard_local=self.shard_local_sampling, dp_size=self.dp_size,
            )
            obs_all = batch["observation"]
            next_obs_all = batch["n_step_next_observation"]
            reward_all = batch["n_step_reward"]
            terminated_all = batch["n_step_terminated"]
            discount_all = batch["n_step_gamma"]
        else:
            batch = rb.sample(
                buffer, sample_key, total,
                shard_local=self.shard_local_sampling, dp_size=self.dp_size,
            )
            obs_all = batch["observation"]
            next_obs_all = batch["next_observation"]
            reward_all = batch["reward"]
            terminated_all = batch["terminated"]
            discount_all = jnp.full_like(reward_all, self.gamma)
        action_all = batch["action"]

        # Welford update from the sampled states + next states
        # (`fastmpo/flax_full_jit/fastmpo.py:545-567`).
        if self.normalize_obs:
            combined = jnp.concatenate([obs_all, next_obs_all], axis=0)
            states = {**states, "obs_normalizer": normalizers.obs_normalizer_update(
                states["obs_normalizer"], combined)}
            obs_all = normalizers.obs_normalize(states["obs_normalizer"], obs_all)
            next_obs_all = normalizers.obs_normalize(states["obs_normalizer"], next_obs_all)

        def per_update(x):
            return x.reshape((n_up, self.batch_size) + x.shape[1:])

        obs_all, next_obs_all, action_all, reward_all, terminated_all, discount_all = map(
            per_update,
            (obs_all, next_obs_all, action_all, reward_all, terminated_all, discount_all),
        )

        policy_state, critic_state, dual_state = states["policy"], states["critic"], states["duals"]
        keys = jax.random.split(update_key, 2 * n_up).reshape(n_up, 2, 2)

        metrics = {}
        idx = 0
        for _ in range(self.nr_policy_updates_per_step):
            for _ in range(self.nr_critic_updates_per_policy_update):
                critic_state, critic_metrics = self._critic_step(
                    policy_state.target_params, critic_state,
                    obs_all[idx], next_obs_all[idx], action_all[idx],
                    reward_all[idx], terminated_all[idx], discount_all[idx], keys[idx, 0],
                )
                critic_state = critic_state.replace(
                    target_params=optax.incremental_update(
                        critic_state.params, critic_state.target_params, self.critic_tau
                    )
                )
                idx += 1
            policy_state, dual_state, policy_metrics = self._policy_dual_step(
                policy_state, dual_state, critic_state.target_params,
                obs_all[idx - 1], next_obs_all[idx - 1], keys[idx - 1, 1],
            )
            policy_state = policy_state.replace(
                target_params=optax.incremental_update(
                    policy_state.params, policy_state.target_params, self.policy_tau
                )
            )
            metrics = {**critic_metrics, **policy_metrics}

        return {**states, "policy": policy_state, "critic": critic_state, "duals": dual_state}, metrics

    def general_properties():
        return GeneralProperties
