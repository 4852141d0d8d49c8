"""Phase-by-phase slope timing of the production step at the
channel512 bench config (512x256x256 f32, stretch_y=2.0, dt=5e-5,
o3/m8/s6 with the bf16-momentum preconditioner) — VERDICT r4 item 2:
end-to-end 1.006 steps/s vs a ~330 GB/s per-shape HBM roofline; find
where the 994 ms goes before picking levers.

Also decomposes the Poisson SpMV kernel's 211-of-330 GB/s gap at this
shape with timing-only kernel variants (no-edge / no-roll / copy).

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/profile512.py
"""

import copy
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


def slope(fn, x, lo=10, hi=40, repeats=3, consts=()):
    """Seconds per application of fn(x, *consts), fixed overheads
    removed. ``consts`` are passed as jit ARGUMENTS, not closure
    captures: at the 512 shape the factor/table trees are ~2 GB and
    constant-capturing them overflows the remote-compile request
    (HTTP 413)."""
    ts = {}
    for iters in (lo, hi):
        g = jax.jit(
            lambda x, *cs, it=iters: sum(
                jnp.sum(leaf)
                for leaf in jax.tree_util.tree_leaves(
                    lax.fori_loop(
                        0, it, lambda i, a: fn(a, *cs), x
                    )
                )
            )
        )
        float(g(x, *consts))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x, *consts))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig
    from fluca_tpu.solvers.krylov import tree_axpy, tree_dot

    N = (512, 256, 256)
    ns = setup_channel_3d(N=N, dt=5e-5, max_steps=10**9,
                          stretch_y=2.0, dtype=jnp.float32)
    impl = ns.impl
    ops = impl.ops
    cfg = CNLinearConfig.production(3, 8, 6)
    cfg.precond_dtype = "bfloat16"
    cfg.precond_scope = "mom"
    impl.cfg = cfg
    mg = impl.mg
    lvl0 = mg.levels[0]
    kernels = {
        "mom3d": ops._mom_kernel3d is not None,
        "mg_pallas": [l.pallas_apply is not None for l in mg.levels],
        "status": dict(ops.kernel_status),
    }
    print(kernels, flush=True)

    state = ns.state
    t = jnp.asarray(0.0, jnp.float32)
    dim = ops.dim
    Bv0 = ops.apply_B(state["v"])
    bcB = ops.bc_B(t)
    v0f = tuple(
        tuple(Bv0[d][c] + bcB[d][c] for c in range(dim))
        for d in range(dim)
    )
    U0 = state["U"]
    diagA = ops.diag_A(U0, v0f)
    Acoeffs = ops.build_momentum_factors_3d(U0, v0f)
    rhs = impl._form_rhs(state, state["phalf"], t, False)
    rng = np.random.default_rng(0)
    rhs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape), a.dtype) * 1e-3,
        rhs,
    )
    x0 = {"v": rhs["v"], "U": rhs["U"], "p": rhs["p"]}
    field = jnp.asarray(
        rng.standard_normal(ns.mesh.cell_shape), jnp.float32) * 1e-3
    b_field = field * 0.5
    results = {}

    # phase filter (r5): HBM at this shape cannot hold every stage's
    # compiled program in one process (the r4 run RESOURCE_EXHAUSTED
    # after the fifth solve stage) — run groups in separate processes:
    #   python examples/profile512.py mom_solve FULL
    only = [a for a in sys.argv[1:] if not a.startswith("-")]

    def stage(name, fn, arg, lo=10, hi=40, consts=()):
        if only and not any(s in name for s in only):
            return
        try:
            t_s = slope(fn, arg, lo=lo, hi=hi, consts=consts)
            results[name] = round(t_s * 1e3, 4)
            print(f"  {name:34s}: {t_s*1e3:9.3f} ms", flush=True)
        except Exception as e:
            results[name] = f"FAILED {type(e).__name__}: {e}"
            print(f"  {name:34s}: {results[name]}", flush=True)

    pre = impl._precond_ctx(Acoeffs, diagA, U0=U0, v0f=v0f)
    assert pre is not None
    apply16 = impl._pre_resources()["momk3d"][1]
    Ac16 = pre["Acoeffs"]
    diagA16 = pre["diagA"]
    tabs = impl._big_tables()

    def with_tabs(fn):
        """Swap the big-table closures for jit-ARG tracers during the
        trace (the production step's tables-as-params discipline;
        closure capture of the ~GB tables overflows the remote
        compiler's request limit)."""

        def run(x, tabs, *cs):
            old = impl._set_big_tables(tabs)
            try:
                return fn(x, *cs)
            finally:
                impl._set_big_tables(old)

        return run

    # ---- primitive applies ------------------------------------------
    stage("A_apply_f32",
          lambda v, Ac: ops.apply_A_coeffs(v, Ac),
          rhs["v"], lo=20, hi=80, consts=(Acoeffs,))
    rv16 = tuple(x.astype(jnp.bfloat16) for x in rhs["v"])
    stage("A_apply_bf16", lambda v, Ac: apply16(v, Ac),
          rv16, lo=20, hi=80, consts=(Ac16,))
    stage("coupled_apply",
          lambda x, Ac: impl._coupled_apply(x, Ac),
          x0, lo=20, hi=80, consts=(Acoeffs,))
    stage("poisson_apply_lvl0",
          with_tabs(lambda p: mg.apply_op(p)),
          field, lo=20, hi=80, consts=(tabs,))
    stage("vcycle_full", with_tabs(lambda p: mg.precondition(p)),
          field, consts=(tabs,))
    stage("dot+axpy_coupled",
          lambda ab: (ab[0],
                      tree_axpy(1e-30 * tree_dot(ab[0], ab[1]).real,
                                ab[0], ab[1])),
          (x0, jax.tree_util.tree_map(lambda a: a * 0.5, x0)),
          lo=20, hi=80)

    # ---- solves at production budgets -------------------------------
    cfg0 = impl.cfg

    def mom_stage(name, solver, pdt=True):
        impl.cfg = copy.copy(cfg0)
        impl.cfg.mom_solver = solver
        if pdt:
            # cast the result back to f32 so the fori_loop carry
            # keeps the input dtype
            stage(name,
                  lambda b, Ac, dA: tuple(
                      y.astype(jnp.float32)
                      for y in impl._solve_momentum(
                          tuple(x.astype(jnp.bfloat16) for x in b),
                          Ac, dA, applyA=lambda v: apply16(v, Ac))),
                  rhs["v"], consts=(Ac16, diagA16))
        else:
            stage(name,
                  lambda b, Ac, dA: impl._solve_momentum(b, Ac, dA),
                  rhs["v"], consts=(Acoeffs, diagA))
        impl.cfg = cfg0

    mom_stage("mom_solve_bicgstab8_bf16", "bicgstab")
    mom_stage("mom_solve_jacobi8_bf16", "jacobi")
    mom_stage("mom_solve_gcr8_bf16", "gcr")
    mom_stage("mom_solve_bicgstab8_f32", "bicgstab", pdt=False)
    mom_stage("mom_solve_jacobi8_f32", "jacobi", pdt=False)
    stage("schur_solve_cg6_f32",
          with_tabs(lambda b: impl._solve_schur(b)),
          field, consts=(tabs,))

    def abf(r, tabs, Ac, dA, Ac16_, dA16_):
        old = impl._set_big_tables(tabs)
        try:
            p = {
                "dtype": pre["dtype"], "mg": pre["mg"],
                "diagA": dA16_, "Acoeffs": Ac16_,
                "applyA": lambda v: apply16(v, Ac16_),
            }
            return impl._abf_apply(r, Ac, dA, p)
        finally:
            impl._set_big_tables(old)

    stage("abf_apply_bf16mom", abf, x0,
          consts=(tabs, Acoeffs, diagA, Ac16, diagA16))

    # ---- per-step prep ----------------------------------------------
    def prep_fn(st, tabs):
        old = impl._set_big_tables(tabs)
        try:
            Bv0 = ops.apply_B(st["v"])
            bcB = ops.bc_B(t)
            v0f = tuple(
                tuple(Bv0[d][c] + bcB[d][c] for c in range(dim))
                for d in range(dim)
            )
            U0 = st["U"]
            dA = ops.diag_A(U0, v0f)
            Ac = ops.build_momentum_factors_3d(U0, v0f)
            r = impl._form_rhs(st, st["phalf"], t, False)
            s = sum(
                jnp.sum(leaf)
                for leaf in jax.tree_util.tree_leaves((dA, Ac))
            )
            return {
                "v": tuple(
                    0.5 * r["v"][c] + 0.0 * s for c in range(dim)
                ),
                "U": tuple(0.5 * u for u in r["U"]),
                "p": 0.5 * r["p"] + st["p"] * 0.5,
                "phalf": st["phalf"],
            }
        finally:
            impl._set_big_tables(old)

    stage("prep(B,diagA,Acoeffs,rhs)+reads", prep_fn, state,
          consts=(tabs,))

    # ---- full step --------------------------------------------------
    def run_step(s, tabs):
        new, _ = impl._traced_step(s, t, tabs, is_first=False)
        return new

    stage("FULL_o3m8s6_bf16mom", run_step, state, lo=4, hi=12,
          consts=(tabs,))

    # ---- SpMV gap decomposition at this shape -----------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fluca_tpu.ops.pallas_stencil import _roll

    N0, N1, N2 = ns.mesh.cell_shape
    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        for TM in (8, 4):
            copy_call = pl.pallas_call(
                lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
                out_shape=jax.ShapeDtypeStruct((N0, N1, N2), dtype),
                grid=(N0 // TM,),
                in_specs=[pl.BlockSpec((TM, N1, N2),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TM, N1, N2),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )
            stage(f"copy_tm{TM}", copy_call, field, lo=20, hi=80)

            # rolls-only variant: same traffic as copy, plus the two
            # in-plane rolls per slab the stencil kernel does
            def mk_roll(TM=TM):
                def k(a, o):
                    acc = a[...] * 1.0000001
                    for s in range(TM):
                        p = a[s]
                        r1 = _roll(p, 1, 0)
                        r2 = _roll(p, 1, 1)
                        acc = acc.at[s].add(1e-20 * (r1 + r2))
                    o[...] = acc
                return k

            roll_call = pl.pallas_call(
                mk_roll(),
                out_shape=jax.ShapeDtypeStruct((N0, N1, N2), dtype),
                grid=(N0 // TM,),
                in_specs=[pl.BlockSpec((TM, N1, N2),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TM, N1, N2),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )
            stage(f"copy+2rolls_tm{TM}", roll_call, field, lo=20, hi=80)

        stage("spmv_lvl0", lvl0.pallas_apply, field, lo=20, hi=80)
        gb = 2 * N0 * N1 * N2 * 4 / 1e9
        for k in ("copy_tm8", "copy_tm4", "copy+2rolls_tm8",
                  "copy+2rolls_tm4", "spmv_lvl0"):
            if isinstance(results.get(k), float):
                results[k + "_gbps"] = round(gb / (results[k] / 1e3), 1)

    # merge with any prior (possibly filtered) run so per-process
    # groups accumulate into one artifact
    path = "/root/repo/PROFILE512.json"
    out = {"N": list(N), "kernels": kernels, "phases_ms": results}
    if only and os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            merged = dict(prior.get("phases_ms", {}))
            merged.update(results)
            out = {"N": list(N), "kernels": kernels,
                   "phases_ms": merged}
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
