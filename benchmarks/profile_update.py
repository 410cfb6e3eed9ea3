"""Decompose the PPO update-phase cost on the real TPU (VERDICT r3 next #1a).

Times jitted variants of the flagship bench's `_optimize` program to locate
where the 108.7 ms/iteration goes: gathers vs forward/backward vs Adam, and
what bf16 params / fused nets / gather-free minibatching would buy.

Each variant is one jitted program that runs the FULL 32-step (4 epochs x 8
minibatches) optimization scan ITERS times via an outer scan, so per-call
dispatch (~35 ms over the axon tunnel) is amortized and only whole-program
timing matters (CLAUDE.md).  Prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

cache_dir = os.environ.get("RLX_BENCH_CACHE", "/tmp/rlx_tpu_jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rlx_tpu.config import create_model, make_config

ITERS = int(os.environ.get("PROF_ITERS", "20"))


def build_model():
    env_name = "locomotion.ant.tpu"
    nr_envs, nr_steps = 4096, 64
    batch = nr_envs * nr_steps
    config = make_config(
        "ppo.tpu",
        env_name,
        **{
            "environment.nr_envs": nr_envs,
            "algorithm.total_timesteps": 10 * batch,
            "algorithm.nr_steps": nr_steps,
            "algorithm.minibatch_size": batch // 8,
            "algorithm.nr_epochs": 4,
            "algorithm.evaluation_active": False,
            "algorithm.logging_active": False,
            "algorithm.policy_hidden_sizes": (512, 256, 128),
            "algorithm.critic_hidden_sizes": (512, 256, 128),
            "algorithm.activation": "elu",
            "algorithm.layer_norm": True,
        },
    )
    return create_model(config)


def timeit(name, fn, *args):
    """jit fn over an outer ITERS-scan; report per-iteration ms."""
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))  # compile
    start = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    ms = (time.perf_counter() - start) / ITERS * 1e3
    print(json.dumps({"variant": name, "ms_per_iteration": round(ms, 2)}), flush=True)
    return ms


def main():
    model = build_model()
    B = model.batch_size
    obs_dim = model.os_shape[0]
    action_dim = int(np.prod(model.as_shape))
    key = jax.random.PRNGKey(0)

    batch_arrays = (
        jax.random.normal(key, (B, obs_dim)),
        jax.random.normal(key, (B, action_dim)),
        jnp.zeros((B,)),
        jnp.zeros((B,)),
        jax.random.normal(key, (B,)),
    )
    ps0, cs0 = model.policy_state, model.critic_state

    def outer(body):
        def run(ps, cs, batch, key):
            def step(carry, k):
                ps, cs = carry
                ps, cs = body(ps, cs, batch, k)
                return (ps, cs), None
            (ps, cs), _ = jax.lax.scan(step, (ps, cs), jax.random.split(key, ITERS))
            return ps, cs
        return run

    # 1. baseline: full _optimize as the bench runs it
    def full(ps, cs, batch, k):
        ps, cs, _ = model._optimize(ps, cs, batch, k)
        return ps, cs

    timeit("full_optimize", outer(full), ps0, cs0, batch_arrays, key)

    # 2. no gathers: contiguous minibatch slices (same fwd/bwd/adam work)
    nr_mb_steps = model.nr_epochs * model.nr_minibatches
    mb = model.minibatch_size

    def no_gather(ps, cs, batch, k):
        obs, act, lp, ret, adv = batch
        grad_loss_fn = jax.value_and_grad(model._loss_fn, argnums=(0, 1), has_aux=True)

        def mb_update(carry, i):
            ps, cs = carry
            s = (i % model.nr_minibatches) * mb
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, mb, axis=0)
            adv_mb = sl(adv)
            adv_mb = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
            (_, _), (pg, cg) = grad_loss_fn(ps.params, cs.params, sl(obs), sl(act), sl(lp), sl(ret), adv_mb)
            return (ps.apply_gradients(grads=pg), cs.apply_gradients(grads=cg)), None

        (ps, cs), _ = jax.lax.scan(mb_update, (ps, cs), jnp.arange(nr_mb_steps))
        return ps, cs

    timeit("no_gather", outer(no_gather), ps0, cs0, batch_arrays, key)

    # 3. gathers only (no fwd/bwd/adam): cost of the index build + 5 gathers
    def gathers_only(ps, cs, batch, k):
        obs, act, lp, ret, adv = batch
        bidx = jnp.tile(jnp.arange(B), (model.nr_epochs, 1))
        bidx = jax.random.permutation(k, bidx, axis=1, independent=True)
        bidx = bidx.reshape((nr_mb_steps, mb))

        def mb_step(carry, idx):
            acc = carry
            acc = acc + obs[idx].sum() + act[idx].sum() + lp[idx].sum() + ret[idx].sum() + adv[idx].sum()
            return acc, None

        acc, _ = jax.lax.scan(mb_step, jnp.zeros(()), bidx)
        ps = ps.replace(params=jax.tree.map(lambda p: p + 0.0 * acc.astype(p.dtype), ps.params))
        return ps, cs

    timeit("gathers_only", outer(gathers_only), ps0, cs0, batch_arrays, key)

    # 4. fwd/bwd only, no adam (grads summed into params with sgd-like add)
    def no_adam(ps, cs, batch, k):
        obs, act, lp, ret, adv = batch
        grad_loss_fn = jax.value_and_grad(model._loss_fn, argnums=(0, 1), has_aux=True)

        def mb_update(carry, i):
            pparams, cparams = carry
            s = (i % model.nr_minibatches) * mb
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, mb, axis=0)
            adv_mb = sl(adv)
            adv_mb = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
            (_, _), (pg, cg) = grad_loss_fn(pparams, cparams, sl(obs), sl(act), sl(lp), sl(ret), adv_mb)
            pparams = jax.tree.map(lambda p, g: p - 1e-6 * g, pparams, pg)
            cparams = jax.tree.map(lambda p, g: p - 1e-6 * g, cparams, cg)
            return (pparams, cparams), None

        (pp, cp), _ = jax.lax.scan(mb_update, (ps.params, cs.params), jnp.arange(nr_mb_steps))
        return ps.replace(params=pp), cs.replace(params=cp)

    timeit("no_adam_sgd", outer(no_adam), ps0, cs0, batch_arrays, key)

    # 5. bf16 batch + bf16 params for fwd/bwd (f32 master copy + adam)
    def bf16_fwdbwd(ps, cs, batch, k):
        obs, act, lp, ret, adv = batch
        obs16 = obs.astype(jnp.bfloat16)
        grad_loss_fn = jax.value_and_grad(model._loss_fn, argnums=(0, 1), has_aux=True)

        def mb_update(carry, i):
            ps, cs = carry
            p16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), ps.params)
            c16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), cs.params)
            s = (i % model.nr_minibatches) * mb
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, mb, axis=0)
            adv_mb = sl(adv)
            adv_mb = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
            (_, _), (pg, cg) = grad_loss_fn(
                p16, c16, sl(obs16), sl(act), sl(lp), sl(ret), adv_mb
            )
            pg = jax.tree.map(lambda g: g.astype(jnp.float32), pg)
            cg = jax.tree.map(lambda g: g.astype(jnp.float32), cg)
            return (ps.apply_gradients(grads=pg), cs.apply_gradients(grads=cg)), None

        (ps, cs), _ = jax.lax.scan(mb_update, (ps, cs), jnp.arange(nr_mb_steps))
        return ps, cs

    timeit("bf16_fwdbwd", outer(bf16_fwdbwd), ps0, cs0, batch_arrays, key)

    # 6. single fwd/bwd over the whole batch once per epoch-equivalent
    #    (4 steps of 262144 instead of 32 steps of 32768 — measures how much
    #    the minibatch granularity itself costs)
    def whole_batch(ps, cs, batch, k):
        obs, act, lp, ret, adv = batch
        grad_loss_fn = jax.value_and_grad(model._loss_fn, argnums=(0, 1), has_aux=True)

        def ep_update(carry, _):
            ps, cs = carry
            advn = (adv - adv.mean()) / (adv.std() + 1e-8)
            (_, _), (pg, cg) = grad_loss_fn(ps.params, cs.params, obs, act, lp, ret, advn)
            return (ps.apply_gradients(grads=pg), cs.apply_gradients(grads=cg)), None

        (ps, cs), _ = jax.lax.scan(ep_update, (ps, cs), None, model.nr_epochs)
        return ps, cs

    timeit("whole_batch_4steps", outer(whole_batch), ps0, cs0, batch_arrays, key)


if __name__ == "__main__":
    main()
