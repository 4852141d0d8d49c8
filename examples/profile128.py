"""Phase-by-phase slope timing of the production step at channel
128^3 f32 (the BENCH channel config) — VERDICT r3 item 1: the step
sat at ~68 ms for two rounds vs a ~12 ms bandwidth floor with no
committed evidence of where the time goes. This script times every
phase of the o3/m8/s6 step and writes PROFILE128.json.

Cost model of one production step (o=3 outer GCR, m=8 momentum,
s=6 Schur):
  step = prep + sum_{j=0..2} [coupled_apply + abf_apply
                              + 2(j+1) coupled dots + axpys]
         + epilogue
  abf_apply = mom_solve(m) + schur_solve(s) + T/D chain + G/Gst chain
  mom bicgstab(m): 2m A-applies + ~4m tree dots + ~6m axpys
  schur cg(s): s Poisson applies + s V-cycles + ~2s dots + ~3s axpys

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/profile128.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def slope(fn, x, lo=20, hi=100, repeats=3):
    """Seconds per application, fixed dispatch overheads removed."""
    ts = {}
    for iters in (lo, hi):
        g = jax.jit(
            lambda x, it=iters: sum(
                jnp.sum(leaf)
                for leaf in jax.tree_util.tree_leaves(
                    lax.fori_loop(0, it, lambda i, a: fn(a), x)
                )
            )
        )
        float(g(x))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig
    from fluca_tpu.solvers.krylov import tree_axpy, tree_dot

    N = 128
    ns = setup_channel_3d(
        N=(N, N, N), dt=2e-3, max_steps=10**9, dtype=jnp.float32
    )
    impl = ns.impl
    ops = impl.ops
    impl.cfg = CNLinearConfig.production()
    mg = impl.mg
    lvl0 = mg.levels[0]
    kernels = {
        "chain3d": ops._chain3d is not None,
        "mom3d": ops._mom_kernel3d is not None,
        "mg_pallas": [l.pallas_apply is not None for l in mg.levels],
    }
    print(kernels, flush=True)

    state = ns.state
    t = jnp.asarray(0.0, jnp.float32)
    sol0 = state
    dim = ops.dim
    Bv0 = ops.apply_B(sol0["v"])
    bcB = ops.bc_B(t)
    v0f = tuple(
        tuple(Bv0[d][c] + bcB[d][c] for c in range(dim))
        for d in range(dim)
    )
    U0 = sol0["U"]
    diagA = ops.diag_A(U0, v0f)
    if ops.has_momentum_kernel3d:
        Acoeffs = ops.build_momentum_factors_3d(U0, v0f)
    else:
        Acoeffs = ops.build_momentum_coeffs(U0, v0f)
    rhs = impl._form_rhs(sol0, state["phalf"], t, False)
    rhs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.default_rng(0).standard_normal(a.shape), a.dtype
        ) * 1e-3,
        rhs,
    )
    x0 = {"v": rhs["v"], "U": rhs["U"], "p": rhs["p"]}
    field = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, N, N)), jnp.float32
    ) * 1e-3
    b_field = field * 0.5
    results = {}

    def stage(name, fn, arg, lo=20, hi=100):
        try:
            t_s = slope(fn, arg, lo=lo, hi=hi)
            results[name] = round(t_s * 1e3, 4)
            print(f"  {name:34s}: {t_s*1e3:8.3f} ms", flush=True)
        except Exception as e:
            results[name] = f"FAILED {type(e).__name__}: {e}"
            print(f"  {name:34s}: {results[name]}", flush=True)

    # ---- primitive applies -------------------------------------------
    stage("A_apply", lambda v: ops.apply_A_coeffs(v, Acoeffs),
          rhs["v"], lo=40, hi=240)
    stage("coupled_apply", lambda x: impl._coupled_apply(x, Acoeffs),
          x0, lo=40, hi=240)
    stage("poisson_apply_lvl0", mg.apply_op, field, lo=40, hi=240)
    stage("poisson_residual_lvl0",
          lambda x: mg._residual(lvl0, x, b_field), field, lo=40, hi=240)
    stage("smooth1_lvl0", lambda x: mg._smooth(lvl0, x, b_field, 1),
          field, lo=40, hi=240)
    stage("vcycle_full", mg.precondition, field)
    if len(mg.levels) > 1:
        f1 = jnp.zeros(mg.levels[1].mesh.cell_shape, jnp.float32)
        stage("vcycle_from_lvl1",
              lambda r: mg._vcycle(1, jnp.zeros_like(r), r), f1,
              lo=40, hi=240)
    stage("restrict+prolong_lvl0",
          lambda r: mg._prolong(
              mg._restrict(r, 3), 3
          ) * 0.124999,
          field, lo=40, hi=240)

    # ---- vector-algebra overheads ------------------------------------
    # one tree dot + axpy over the 3-component velocity (the bicgstab
    # per-dot cost unit): reads a,b + writes b
    stage("dot+axpy_vel3",
          lambda ab: (ab[0],
                      tree_axpy(1e-30 * tree_dot(ab[0], ab[1]).real,
                                ab[0], ab[1])),
          (rhs["v"], tuple(v * 0.5 for v in rhs["v"])), lo=40, hi=240)
    stage("dot+axpy_coupled",
          lambda ab: (ab[0],
                      tree_axpy(1e-30 * tree_dot(ab[0], ab[1]).real,
                                ab[0], ab[1])),
          (x0, jax.tree_util.tree_map(lambda a: a * 0.5, x0)),
          lo=40, hi=240)

    # ---- solves at production budgets --------------------------------
    cfg0 = impl.cfg
    stage("mom_solve_bicgstab8",
          lambda b: impl._solve_momentum(b, Acoeffs, diagA), rhs["v"])
    import copy
    impl.cfg = copy.copy(cfg0)
    impl.cfg.mom_solver = "jacobi"
    stage("mom_solve_jacobi8",
          lambda b: impl._solve_momentum(b, Acoeffs, diagA), rhs["v"])
    impl.cfg = copy.copy(cfg0)
    impl.cfg.mom_solver = "gcr"
    stage("mom_solve_gcr8",
          lambda b: impl._solve_momentum(b, Acoeffs, diagA), rhs["v"])
    impl.cfg = cfg0
    stage("schur_solve_cg6", lambda b: impl._solve_schur(b), field)
    impl.cfg = copy.copy(cfg0)
    impl.cfg.schur_solver = "vcycle"
    stage("schur_solve_vcycle6",
          lambda b: impl._solve_schur(b), field)
    impl.cfg = cfg0
    stage("abf_apply", lambda r: impl._abf_apply(r, Acoeffs, diagA),
          x0)

    # ---- per-step prep (B-interp, diagA, Acoeffs, RHS) ---------------
    def prep(st):
        Bv0 = ops.apply_B(st["v"])
        bcB = ops.bc_B(t)
        v0f = tuple(
            tuple(Bv0[d][c] + bcB[d][c] for c in range(dim))
            for d in range(dim)
        )
        U0 = st["U"]
        dA = ops.diag_A(U0, v0f)
        if ops.has_momentum_kernel3d:
            Ac = ops.build_momentum_factors_3d(U0, v0f)
        else:
            Ac = ops.build_momentum_coeffs(U0, v0f)
        r = impl._form_rhs(st, st["phalf"], t, False)
        # consume every produced leaf (one extra read pass per leaf —
        # reported cost is therefore a slight over-estimate)
        s = sum(
            jnp.sum(leaf)
            for leaf in jax.tree_util.tree_leaves((dA, Ac))
        )
        return {
            "v": tuple(0.5 * r["v"][c] + 0.0 * s for c in range(dim)),
            "U": tuple(0.5 * u for u in r["U"]),
            "p": 0.5 * r["p"] + st["p"] * 0.5,
            "phalf": st["phalf"],
        }

    stage("prep(B,diagA,Acoeffs,rhs)+reads", prep, state)

    # ---- full steps ---------------------------------------------------
    def full(cfg, name, lo=10, hi=40):
        impl.cfg = cfg

        def run_step(s):
            new, _ = impl._step_impl(s, t, is_first_step=False)
            return new

        stage(name, run_step, state, lo=lo, hi=hi)
        impl.cfg = cfg0

    full(CNLinearConfig.production(), "FULL_production_o3m8s6")
    fastcfg = CNLinearConfig.production_fast()
    full(fastcfg, "FULL_fast_rich_jac_vcyc")
    mix = CNLinearConfig.production_fast()
    mix.outer_type = "gcr"
    full(mix, "FULL_gcr_jacobi_vcycle")
    impl.cfg = cfg0

    out = {"N": N, "kernels": kernels, "phases_ms": results}
    with open("/root/repo/PROFILE128.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
