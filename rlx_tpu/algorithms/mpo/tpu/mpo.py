"""MPO: maximum a-posteriori policy optimization, as one fused program.

Parity with `rl_x/algorithms/mpo/flax/mpo.py:209-330`:
- categorical distributional critic (51 atoms over [v_min, v_max]) trained
  by cross-entropy against the soft-projected n-step target averaged over
  ``action_sampling_number`` target-policy action samples;
- non-parametric E-step: improvement distribution softmax(Q/eta) over the
  sampled actions with the temperature eta optimized through its own dual
  loss (logsumexp form), plus the out-of-bounds action penalty dual;
- decoupled parametric M-step: separate mean and stddev policy-gradient
  terms (each evaluated with the other statistic frozen at the target
  policy), per-dimension KL constraints with alpha duals;
- periodic hard target updates: critic every ``target_network_update_period``
  updates, actor every ``actor_update_period`` (select-applied in-jit).

Batched re-derivation: the per-sample vmap of the reference becomes batched
[S, 2B] tensors (the E-step runs on the stacked (s, s') states exactly as
`mpo.py:239`).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn
from flax.training.train_state import TrainState
from jax.lax import stop_gradient

from rlx_tpu.algorithms.mpo.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.offpolicy import OffPolicyAlgorithm
from rlx_tpu.algorithms.train_state import RLTrainState
from rlx_tpu.models.mlp import MLP, VectorQCritic
from rlx_tpu.ops import normalizers


class MPOGaussianPolicy(nn.Module):
    action_dim: int
    hidden_sizes: Sequence[int]
    activation: str = "elu"
    layer_norm: bool = True
    init_scale: float = 0.5
    min_scale: float = 1e-6
    observation_indices: Sequence[int] = None
    layer_norm_all: bool = False      # LayerNorm after every Dense (FastSAC trunk)
    zero_init_heads: bool = False     # constant-0 mean/std heads (FastSAC heads)
    scaled_std_head: bool = False     # min + softplus(raw) * init / softplus(0)
    orthogonal_init: bool = True

    @nn.compact
    def __call__(self, x):
        if self.observation_indices is not None:
            x = x[..., jnp.asarray(self.observation_indices)]
        x = MLP(self.hidden_sizes, self.activation, self.layer_norm,
                orthogonal_init=self.orthogonal_init, layer_norm_all=self.layer_norm_all)(x)
        head_kwargs = (
            dict(kernel_init=nn.initializers.constant(0.0), bias_init=nn.initializers.constant(0.0))
            if self.zero_init_heads else {}
        )
        mean = nn.Dense(self.action_dim, **head_kwargs)(x)
        raw_std = nn.Dense(self.action_dim, **head_kwargs)(x)
        if self.scaled_std_head:
            # FastSAC-style head (`fastmpo/flax_full_jit/policy.py:63-66`)
            std = self.min_scale + jax.nn.softplus(raw_std) * (
                self.init_scale / float(np.log(2.0))
            )
        else:
            # softplus head shifted so std == init_scale at raw_std == 0
            shift = float(np.log(np.expm1(self.init_scale)))
            std = jax.nn.softplus(raw_std + shift) + self.min_scale
        return mean, std


class DualVariables(nn.Module):
    action_dim: int
    init_log_eta: float = 10.0
    init_log_alpha_mean: float = 10.0
    init_log_alpha_stddev: float = 1000.0
    init_log_penalty_temperature: float = 10.0

    @nn.compact
    def __call__(self):
        log_eta = self.param("log_eta", nn.initializers.constant(self.init_log_eta), ())
        log_alpha_mean = self.param(
            "log_alpha_mean", nn.initializers.constant(self.init_log_alpha_mean), (self.action_dim,)
        )
        log_alpha_stddev = self.param(
            "log_alpha_stddev", nn.initializers.constant(self.init_log_alpha_stddev), (self.action_dim,)
        )
        log_penalty_temperature = self.param(
            "log_penalty_temperature",
            nn.initializers.constant(self.init_log_penalty_temperature), ()
        )
        return log_eta, log_alpha_mean, log_alpha_stddev, log_penalty_temperature


class MPO(OffPolicyAlgorithm):
    EPS = 1e-8

    def _make_tx(self, lr, weight_decay=0.0, b1=0.9, b2=0.999):
        a = self.config.algorithm
        if weight_decay > 0.0:
            opt = optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, weight_decay=weight_decay, b1=b1, b2=b2
            )
        else:
            opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1, b2=b2)
        return optax.chain(optax.clip_by_global_norm(a.max_grad_norm), opt)

    def _build_policy(self, a):
        return MPOGaussianPolicy(
            action_dim=self.action_dim,
            hidden_sizes=tuple(a.policy_hidden_sizes),
            activation=a.activation,
            layer_norm=a.layer_norm,
            init_scale=a.policy_init_scale,
            min_scale=a.policy_min_scale,
            observation_indices=getattr(self.train_env, "policy_observation_indices", None),
        )

    def _build_critic(self, a):
        return VectorQCritic(
            hidden_sizes=tuple(a.critic_hidden_sizes),
            nr_critics=self.nr_critics,
            activation=a.activation,
            layer_norm=a.layer_norm,
            output_dim=self.nr_atoms,
            observation_indices=getattr(self.train_env, "critic_observation_indices", None),
        )

    def setup_states(self):
        a = self.config.algorithm
        self.key, policy_key, critic_key, dual_key = jax.random.split(self.key, 4)
        self.v_min, self.v_max = a.v_min, a.v_max
        self.nr_atoms = a.nr_atoms
        self.atoms = jnp.linspace(self.v_min, self.v_max, self.nr_atoms)
        self.action_samples = a.action_sampling_number
        self.eps_nonparametric = a.epsilon_non_parametric
        self.eps_mu = a.epsilon_parametric_mu
        self.eps_sigma = a.epsilon_parametric_sigma
        self.eps_penalty = a.epsilon_penalty
        self.action_penalty = a.action_penalization
        self.actor_update_period = getattr(a, "actor_update_period", 1)
        self.target_update_period = getattr(a, "target_network_update_period", 1)
        self.normalize_obs = a.enable_observation_normalization
        self.nr_critics = 2 if getattr(a, "dual_critic", False) else 1
        self.clipped_double_q = getattr(a, "clipped_double_q_learning", False)
        self.min_log_temperature = getattr(a, "min_log_temperature", -18.0)
        self.min_log_alpha = getattr(a, "min_log_alpha", -18.0)

        self.policy = self._build_policy(a)
        self.critic = self._build_critic(a)
        self.duals = DualVariables(
            self.action_dim, a.init_log_eta, a.init_log_alpha_mean,
            a.init_log_alpha_stddev, a.init_log_penalty_temperature,
        )

        policy_lr = getattr(a, "policy_learning_rate", None) or a.learning_rate
        critic_lr = getattr(a, "critic_learning_rate", None) or a.learning_rate
        b1 = getattr(a, "adam_beta1", 0.9)
        b2 = getattr(a, "adam_beta2", 0.999)
        dummy_obs = jnp.zeros((1,) + self.os_shape, jnp.float32)
        dummy_action = jnp.zeros((1, self.action_dim), jnp.float32)
        states = {
            "policy": RLTrainState.create(
                apply_fn=self.policy.apply,
                params=self.policy.init(policy_key, dummy_obs),
                target_params=self.policy.init(policy_key, dummy_obs),
                tx=self._make_tx(policy_lr, getattr(a, "policy_weight_decay", 0.0), b1, b2),
            ),
            "critic": RLTrainState.create(
                apply_fn=self.critic.apply,
                params=self.critic.init(critic_key, dummy_obs, dummy_action),
                target_params=self.critic.init(critic_key, dummy_obs, dummy_action),
                tx=self._make_tx(critic_lr, getattr(a, "critic_weight_decay", 0.0), b1, b2),
            ),
            "duals": TrainState.create(
                apply_fn=self.duals.apply,
                params=self.duals.init(dual_key),
                tx=self._make_tx(a.dual_learning_rate, getattr(a, "dual_weight_decay", 0.0), b1, b2),
            ),
        }
        if self.normalize_obs:
            states["obs_normalizer"] = normalizers.obs_normalizer_init(self.os_shape)
        return states

    def _norm(self, states, observation):
        if self.normalize_obs:
            return normalizers.obs_normalize(states["obs_normalizer"], observation)
        return observation

    def observe_transition(self, states, observation, env_state):
        if not self.normalize_obs:
            return states
        return {**states, "obs_normalizer": normalizers.obs_normalizer_update(
            states["obs_normalizer"], observation)}

    def act(self, states, observation, key, step):
        mean, std = self.policy.apply(states["policy"].params, self._norm(states, observation))
        return jnp.clip(mean + std * jax.random.normal(key, mean.shape), -1.0, 1.0)

    def eval_act(self, states, observation):
        mean, _ = self.policy.apply(states["policy"].params, self._norm(states, observation))
        return jnp.clip(mean, -1.0, 1.0)

    def _critic_step(self, policy_target_params, critic_state, obs, next_obs, action,
                     reward, terminated, discount_n, key):
        """One distributional critic gradient step (no target refresh).

        Generalized over ``nr_critics``: each critic is trained against the
        projection of its own target pmf averaged over action samples
        (`fastmpo/flax_full_jit/fastmpo.py:317-372`); with
        ``clipped_double_q_learning`` both critics share the distribution of
        the lower-valued one.
        """
        B = obs.shape[0]
        S = self.action_samples
        N = self.nr_critics

        t_mean, t_std = self.policy.apply(policy_target_params, next_obs)
        next_actions = t_mean[None] + t_std[None] * jax.random.normal(key, (S, B, self.action_dim))
        flat_next_obs = jnp.broadcast_to(next_obs[None], (S, B) + next_obs.shape[1:]).reshape(
            (S * B,) + next_obs.shape[1:]
        )
        next_logits = self.critic.apply(
            critic_state.target_params, flat_next_obs, next_actions.reshape(S * B, -1)
        ).reshape(N, S, B, self.nr_atoms)
        next_pmf = jax.nn.softmax(next_logits, axis=-1).mean(axis=1)  # [N, B, atoms]

        bootstrap = 1.0 - terminated
        target_z = jnp.clip(
            reward[:, None] + discount_n[:, None] * bootstrap[:, None] * self.atoms[None],
            self.v_min, self.v_max,
        )  # [B, atoms_src]
        delta_z = float((self.v_max - self.v_min) / (self.nr_atoms - 1))
        # soft projection weights [B, atoms_tgt, atoms_src]
        weights = jnp.clip(
            1.0 - jnp.abs(target_z[:, None, :] - self.atoms[None, :, None]) / delta_z, 0.0, 1.0
        )
        target_pmf = jnp.einsum("bts,nbs->nbt", weights, next_pmf)  # [N, B, atoms]
        if self.clipped_double_q and N == 2:
            target_q = (target_pmf * self.atoms).sum(-1)  # [N, B]
            use_first = (target_q[0] <= target_q[1])[None, :, None]
            chosen = jnp.where(use_first, target_pmf[0][None], target_pmf[1][None])
            target_pmf = jnp.broadcast_to(chosen, target_pmf.shape)
        target_pmf = stop_gradient(target_pmf)

        def critic_loss_fn(critic_params):
            logits = self.critic.apply(critic_params, obs, action)  # [N, B, atoms]
            q_loss = -(target_pmf * jax.nn.log_softmax(logits, axis=-1)).sum(-1).sum(0).mean()
            current_q = (jax.nn.softmax(logits, axis=-1) * self.atoms).sum(-1)
            return q_loss, current_q.mean()

        (q_loss, q_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            critic_state.params
        )
        critic_state = critic_state.apply_gradients(grads=critic_grads)
        metrics = {
            "loss/critic_loss": q_loss,
            "q_value/q_value": q_mean,
            "gradients/critic_grad_norm": optax.global_norm(critic_grads),
        }
        return critic_state, metrics

    def _policy_dual_step(self, policy_state, dual_state, critic_target_params, obs, next_obs, key):
        """One decoupled E/M policy + dual-variable gradient step."""
        stacked = jnp.concatenate([obs, next_obs], axis=0)  # [2B, obs]
        B = obs.shape[0]
        S = self.action_samples
        estep_key = key
        t_mean2, t_std2 = self.policy.apply(policy_state.target_params, stacked)
        sampled = t_mean2[None] + t_std2[None] * jax.random.normal(
            estep_key, (S, 2 * B, self.action_dim)
        )
        flat_stacked = jnp.broadcast_to(stacked[None], (S, 2 * B) + stacked.shape[1:]).reshape(
            (S * 2 * B,) + stacked.shape[1:]
        )
        q_logits = self.critic.apply(
            stop_gradient(critic_target_params), flat_stacked, sampled.reshape(S * 2 * B, -1)
        ).reshape(self.nr_critics, S, 2 * B, self.nr_atoms)
        per_critic_q = (jax.nn.softmax(q_logits, axis=-1) * self.atoms).sum(-1)  # [N, S, 2B]
        if self.clipped_double_q and self.nr_critics > 1:
            sampled_q = per_critic_q.min(axis=0)
        else:
            sampled_q = per_critic_q.mean(axis=0)  # [S, 2B]

        def actor_dual_loss_fn(policy_params, dual_params):
            log_eta, log_alpha_mean, log_alpha_stddev, log_penalty_temp = self.duals.apply(dual_params)
            eta = jax.nn.softplus(log_eta) + self.EPS
            improvement = jax.nn.softmax(sampled_q / stop_gradient(eta), axis=0)  # [S, 2B]
            q_logsumexp = jax.scipy.special.logsumexp(sampled_q / eta, axis=0)
            loss_eta = eta * (self.eps_nonparametric + q_logsumexp.mean() - jnp.log(S))

            penalty_temperature = jax.nn.softplus(log_penalty_temp) + self.EPS
            if self.action_penalty:
                diff_oob = sampled - jnp.clip(sampled, -1.0, 1.0)
                cost_oob = -jnp.linalg.norm(diff_oob, axis=-1)  # [S, 2B]
                penalty_improvement = jax.nn.softmax(
                    cost_oob / stop_gradient(penalty_temperature), axis=0
                )
                penalty_logsumexp = jax.scipy.special.logsumexp(cost_oob / penalty_temperature, axis=0)
                loss_eta = loss_eta + penalty_temperature * (
                    self.eps_penalty + penalty_logsumexp.mean() - jnp.log(S)
                )
                improvement = improvement + penalty_improvement

            online_mean, online_std = self.policy.apply(policy_params, stacked)
            alpha_mean = jax.nn.softplus(log_alpha_mean) + self.EPS
            alpha_std = jax.nn.softplus(log_alpha_stddev) + self.EPS

            # decoupled mean term (std frozen at target)
            logprob_mean = (
                -0.5 * (((sampled - online_mean[None]) / t_std2[None]) ** 2 + jnp.log(2.0 * jnp.pi))
                - jnp.log(t_std2[None])
            ).sum(-1)
            loss_pg_mean = -(logprob_mean * improvement).sum(0).mean()
            kl_mean = ((t_mean2 - online_mean) ** 2) / (2.0 * t_std2**2)
            mean_kl_mean = kl_mean.mean(axis=0)  # [A]
            loss_kl_mean = (stop_gradient(alpha_mean) * mean_kl_mean).sum()
            loss_alpha_mean = (alpha_mean * (self.eps_mu - stop_gradient(mean_kl_mean))).sum()

            # decoupled std term (mean frozen at target)
            logprob_std = (
                -0.5 * (((sampled - t_mean2[None]) / online_std[None]) ** 2 + jnp.log(2.0 * jnp.pi))
                - jnp.log(online_std[None])
            ).sum(-1)
            loss_pg_std = -(logprob_std * improvement).sum(0).mean()
            kl_std = jnp.log(online_std / t_std2) + t_std2**2 / (2.0 * online_std**2) - 0.5
            mean_kl_std = kl_std.mean(axis=0)
            loss_kl_std = (stop_gradient(alpha_std) * mean_kl_std).sum()
            loss_alpha_std = (alpha_std * (self.eps_sigma - stop_gradient(mean_kl_std))).sum()

            actor_loss = loss_pg_mean + loss_pg_std + loss_kl_mean + loss_kl_std
            dual_loss = loss_alpha_mean + loss_alpha_std + loss_eta
            metrics = {
                "loss/actor_loss": actor_loss,
                "loss/dual_loss": dual_loss,
                "dual/eta": eta,
                "dual/alpha_mean": alpha_mean.mean(),
                "dual/alpha_std": alpha_std.mean(),
                "kl/mean_kl_mean": mean_kl_mean.mean(),
                "kl/mean_kl_std": mean_kl_std.mean(),
                "policy/std_mean": online_std.mean(),
            }
            return actor_loss + dual_loss, metrics

        (_, metrics), (policy_grads, dual_grads) = jax.value_and_grad(
            actor_dual_loss_fn, argnums=(0, 1), has_aux=True
        )(policy_state.params, dual_state.params)
        policy_state = policy_state.apply_gradients(grads=policy_grads)
        dual_state = dual_state.apply_gradients(grads=dual_grads)
        dual_state = self._clamp_duals(dual_state)

        metrics.update({
            "gradients/policy_grad_norm": optax.global_norm(policy_grads),
            "gradients/dual_grad_norm": optax.global_norm(dual_grads),
        })
        return policy_state, dual_state, metrics

    def _clamp_duals(self, dual_state):
        """Floor the log duals so softplus temperatures can't collapse
        (`fastmpo/flax_full_jit/fastmpo.py:615-625`)."""
        p = dual_state.params["params"]
        return dual_state.replace(params={"params": {
            "log_eta": jnp.maximum(p["log_eta"], self.min_log_temperature),
            "log_alpha_mean": jnp.maximum(p["log_alpha_mean"], self.min_log_alpha),
            "log_alpha_stddev": jnp.maximum(p["log_alpha_stddev"], self.min_log_alpha),
            "log_penalty_temperature": p["log_penalty_temperature"],
        }})

    def update(self, states, batch, key, step):
        policy_state, critic_state, dual_state = states["policy"], states["critic"], states["duals"]
        critic_key, estep_key = jax.random.split(key)

        obs = self._norm(states, batch["observation"])
        next_obs = self._norm(states, batch["n_step_next_observation" if self.n_step > 1 else "next_observation"])
        reward = batch["n_step_reward"] if self.n_step > 1 else batch["reward"]
        terminated = batch["n_step_terminated"] if self.n_step > 1 else batch["terminated"]
        discount_n = batch["n_step_gamma"] if self.n_step > 1 else jnp.full_like(reward, self.gamma)

        critic_state, critic_metrics = self._critic_step(
            policy_state.target_params, critic_state, obs, next_obs, batch["action"],
            reward, terminated, discount_n, critic_key,
        )
        policy_state, dual_state, metrics = self._policy_dual_step(
            policy_state, dual_state, critic_state.target_params, obs, next_obs, estep_key,
        )

        # periodic hard target refreshes
        do_critic_target = (step % self.target_update_period) == 0
        critic_state = critic_state.replace(
            target_params=jax.tree.map(
                lambda p, t: jnp.where(do_critic_target, p, t),
                critic_state.params, critic_state.target_params,
            )
        )
        do_actor_target = (step % self.actor_update_period) == 0
        policy_state = policy_state.replace(
            target_params=jax.tree.map(
                lambda p, t: jnp.where(do_actor_target, p, t),
                policy_state.params, policy_state.target_params,
            )
        )

        metrics.update(critic_metrics)
        return {**states, "policy": policy_state, "critic": critic_state, "duals": dual_state}, metrics

    def general_properties():
        return GeneralProperties
