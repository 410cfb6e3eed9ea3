"""Decompose the physics substep cost on the real TPU (round 5).

After the tree-sparse rewrite (CRBA + RNEA backward + LTDL) the substep is
~0.18 ms at B=4096; this times the substep's internal phases as jitted
ITERS-step scans so the next optimization target is measured, not guessed:

- fk_jacobians: forward kinematics + world Jacobian columns
- dynamics_full: M (CRBA) + bias wrenches (adds spatial inertias, velocity
  recursion) on top of fk
- contact: contact wrenches + anchor update on top of fk/dynamics
- solve: LTDL factor+solve given M, tau
- substep_full: one full forward_dynamics + integrate

Each phase is measured as a cumulative scan (carry = qpos/qvel so XLA
cannot hoist the work); subtract successive numbers for per-phase cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("RLX_BENCH_CACHE", "/tmp/rlx_tpu_jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rlx_tpu.config import create_model, make_config
from rlx_tpu.physics import batched as bl
from rlx_tpu.physics import engine

ITERS = int(os.environ.get("PROF_ITERS", "256"))
NR_ENVS = int(os.environ.get("PROF_NR_ENVS", "4096"))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    start = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    ms = (time.perf_counter() - start) / ITERS * 1e3
    print(json.dumps({"variant": name, "ms_per_iter": round(ms, 4)}), flush=True)
    return ms


def main():
    config = make_config(
        "ppo.tpu", "locomotion.ant.tpu",
        **{"environment.nr_envs": NR_ENVS, "algorithm.evaluation_active": False,
           "algorithm.logging_active": False},
    )
    model = create_model(config)
    env = model.train_env
    inner = env
    while not hasattr(inner, "model") and hasattr(inner, "env"):
        inner = inner.env
    pm = inner.model
    key = jax.random.PRNGKey(0)
    state0 = jax.jit(lambda k: env.reset(k, eval_mode=False))(key)
    phys = state0.physics
    qpos0 = (phys["qpos"] if isinstance(phys, dict) else phys.qpos)
    qvel0 = (phys["qvel"] if isinstance(phys, dict) else phys.qvel)
    ctrlT = jnp.zeros((len(pm.act_dof), NR_ENVS))
    lam, dof_body = engine._dof_structure(pm)

    def scanner(body):
        def fn(qpos, qvel):
            def step(carry, _):
                qposT, qvelT = carry
                dq, dv = body(qposT, qvelT)
                return (qposT + 1e-6 * dq, qvelT + 1e-6 * dv), None
            carry, _ = jax.lax.scan(step, (qpos.T, qvel.T), None, ITERS)
            return carry
        return fn

    def fk_jac(qposT, qvelT):
        Rs, ps = engine._kinematics_T(pm, qposT)
        cols = engine._jacobian_columns_T(pm, Rs, ps)
        return qposT * 0 + cols.sum((0, 1))[None], qvelT * 0 + ps[-1].sum(0)[None]

    def dynamics_full(qposT, qvelT):
        M, f_bias, Rs, ps, v_list, cols = engine._dynamics_T(pm, qposT, qvelT)
        C = engine._backward_project_T(pm, cols, f_bias, dof_body)
        return qposT * 0 + M.sum((0, 1))[None], qvelT * 0 + C.sum(0)[None]

    def with_contact(qposT, qvelT):
        M, f_bias, Rs, ps, v_list, cols = engine._dynamics_T(pm, qposT, qvelT)
        anchorsT = engine.contact_points_T(pm, qposT)
        wrenches, anchorsT = engine._contact_wrenches_T(
            pm, Rs, ps, v_list, 0.015, 1.0, None, None, anchorsT)
        f_net = [fb if w is None else fb - w for fb, w in zip(f_bias, wrenches)]
        C = engine._backward_project_T(pm, cols, f_net, dof_body)
        return qposT * 0 + M.sum((0, 1))[None] + anchorsT.sum((0, 1))[None], qvelT * 0 + C.sum(0)[None]

    def with_solve(qposT, qvelT):
        M, f_bias, Rs, ps, v_list, cols = engine._dynamics_T(pm, qposT, qvelT)
        anchorsT = engine.contact_points_T(pm, qposT)
        wrenches, anchorsT = engine._contact_wrenches_T(
            pm, Rs, ps, v_list, 0.015, 1.0, None, None, anchorsT)
        f_net = [fb if w is None else fb - w for fb, w in zip(f_bias, wrenches)]
        C = engine._backward_project_T(pm, cols, f_net, dof_body)
        qacc = bl.ltdl_solve(M, -C, lam)
        return qposT * 0 + anchorsT.sum((0, 1))[None], qvelT * 0 + qacc

    def substep_full(qposT, qvelT):
        qaccT, _ = engine._forward_dynamics_T(
            pm, qposT, qvelT, ctrlT, 0.015, 1.0, 200.0, True)
        qp, qv = engine._integrate_T(pm, qposT, qvelT, qaccT, pm.timestep)
        return qp - qposT, qv - qvelT

    timeit("fk_jacobians", scanner(fk_jac), qpos0, qvel0)
    timeit("dynamics_full(fk+M+bias)", scanner(dynamics_full), qpos0, qvel0)
    timeit("plus_contact", scanner(with_contact), qpos0, qvel0)
    timeit("plus_solve", scanner(with_solve), qpos0, qvel0)
    timeit("substep_full", scanner(substep_full), qpos0, qvel0)


if __name__ == "__main__":
    main()
