"""Benchmark: pressure-Poisson stencil SpMV vs the HBM roofline.

Primary metric (BASELINE.json north star: Poisson SpMV >= 80% of the
HBM-bandwidth roofline per chip): the fused Pallas 5-point Poisson
kernel's effective bandwidth as a fraction of the chip's MEASURED
speed-of-light (a pure copy kernel through the same pipeline — no
stencil can move data faster than a copy).

Timing uses iteration-count slopes with a forced scalar host fetch:
per-call fixed overheads (dispatch/tunnel sync) cancel in the slope,
so the number is pure device throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

# Perf-regression bands (VERDICT r2 item 7): the full bench run exits
# nonzero when a committed floor is breached, so a deliberate (or
# accidental) kernel slowdown fails CI instead of silently shipping.
# Floors sit ~10% under the best committed measurement (tunnel jitter
# margin); ratchet them when a kernel lever lands. Skipped off-TPU.
PERF_BANDS = {
    "roofline_frac": 0.88,             # r2-r5: 0.938/0.918/0.917/0.936
    # r5 end-of-round ratchet: floors ~10% under the r5 measurements
    # (scalar-sync timing + self-edge kernels; bench_r5.log)
    "cavity2d_256_steps_per_sec": 500,  # r5: 553.0
    "cavity3d_64_steps_per_sec": 78,    # r5: 87.3
    "channel3d_128_steps_per_sec": 19,       # r5: 21.46
    "channel3d_128_bf16_steps_per_sec": 25,  # r5: 28.42
    "channel3d_128_fast_steps_per_sec": 37,  # r5: 42.16
    # r5: o2+jac6+s8 bf16mom at full o3 solve quality (TUNE512) +
    # scalar-sync timing: 1.006 -> 2.918 steps/s, retention-gated
    "channel512_steps_per_sec": 2.6,
    # stencil SpMV bandwidth at the channel512 shape: the self-edge
    # kernel form (c318564) runs 299.6 GB/s = 0.91x the 330 GB/s
    # per-shape copy roofline (PROBE512.json HBM cliff)
    "channel512_spmv_gbps": 270,        # r4: 211.2, r5: 299.6
}

# Ceilings (metric must stay BELOW; same missing-metric-is-a-breach
# rule): the channel512 per-step coupled residual — a faster config
# that silently loosens the solve must fail the gate, not ship
# (VERDICT r4 weak #2/#3).
PERF_CEILINGS = {
    "channel512_rnorm": 500.0,          # r4: 350.42 (o3+bf16mom)
    # hardware no-regression evidence for the sharded path (VERDICT
    # r4 missing #4a): the shard_map'd Poisson kernel on a 1x1 device
    # grid vs the unsharded kernel, same chip/shape
    "sharded_1x1_ratio": 1.15,
}


def check_bands(values) -> int:
    """Compare measured values against PERF_BANDS; print violations
    and return the number of breaches (0 = pass). A banded metric
    that was not measured at all (None / absent) is itself a breach:
    a crashed bench variant must fail the gate, not bypass it
    (VERDICT r3 weak #3 — the r3 run skipped every band because one
    optional variant diverged)."""
    import jax

    if jax.devices()[0].platform != "tpu":
        return 0
    bad = 0
    for key, floor in PERF_BANDS.items():
        got = values.get(key)
        if got is None:
            print(
                f"PERF GATE: {key} was not measured (floor {floor}) "
                f"— counting as a breach",
                file=sys.stderr,
            )
            bad += 1
            continue
        if got < floor:
            print(
                f"PERF REGRESSION: {key} = {got} < floor {floor}",
                file=sys.stderr,
            )
            bad += 1
    for key, ceil in PERF_CEILINGS.items():
        got = values.get(key)
        if got is None:
            print(
                f"PERF GATE: {key} was not measured (ceiling {ceil})"
                f" — counting as a breach",
                file=sys.stderr,
            )
            bad += 1
            continue
        if got > ceil:
            print(
                f"SOLVE-QUALITY REGRESSION: {key} = {got} > ceiling "
                f"{ceil}",
                file=sys.stderr,
            )
            bad += 1
    return bad


def slope_time_per_iter(fn, x, iters_lo=50, iters_hi=400, repeats=3):
    """Seconds per application of fn, fixed overheads removed.

    The iteration windows must be long enough that tunnel round-trip
    jitter (~ms) is small against the device time (tens of ms), or the
    slope swings wildly run to run — hence 50/400, not 10/60."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    ts = {}
    for iters in (iters_lo, iters_hi):
        g = jax.jit(
            lambda x, it=iters: sum(
                jnp.sum(leaf)
                for leaf in jax.tree_util.tree_leaves(
                    lax.fori_loop(0, it, lambda i, a: fn(a), x)
                )
            )
        )
        float(g(x))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[iters_hi] - ts[iters_lo]) / (iters_hi - iters_lo)


def spmv_roofline(N=4096):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import zero_velocity_bc
    from fluca_tpu.solvers.mg import PoissonMG
    dtype = jnp.float32
    mesh = CartMesh.create((N, N))
    mesh.set_uniform_coordinates(0.0, 1.0, 0.0, 1.0)
    bcs = [zero_velocity_bc()] * 4
    mg = PoissonMG(mesh, bcs, scale=1.0, dtype=dtype)
    lvl = mg.levels[0]
    spmv = (
        lvl.pallas_apply
        if lvl.pallas_apply is not None
        else (lambda p: mg._apply_level(lvl, p))
    )

    # speed-of-light reference: pure copy kernel, same tiling
    on_tpu = jax.devices()[0].platform == "tpu"
    TM = 128
    if on_tpu:
        copy_call = pl.pallas_call(
            lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
            out_shape=jax.ShapeDtypeStruct((N, N), dtype),
            grid=(N // TM,),
            in_specs=[
                pl.BlockSpec((TM, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
    else:
        copy_call = lambda a: a * 1.0000001

    x = jnp.ones((N, N), dtype)
    t_copy = slope_time_per_iter(copy_call, x)
    t_spmv = slope_time_per_iter(spmv, x)

    bytes_moved = 2 * N * N * np.dtype(np.float32).itemsize
    gbps_copy = bytes_moved / t_copy / 1e9
    gbps_spmv = bytes_moved / t_spmv / 1e9
    frac = gbps_spmv / gbps_copy
    return {
        "frac": frac,
        "gbps_copy": gbps_copy,
        "gbps_spmv": gbps_spmv,
        "us_per_apply": t_spmv * 1e6,
        "N": N,
    }


def sharded_1x1_ratio(N=4096):
    """Sharded-vs-unsharded Poisson kernel time on the real chip at a
    degenerate 1x1 device grid (VERDICT r4 missing #4a: a hardware
    no-regression entry for the sharded path — the shard_map wrapper
    with its ppermute edge fills must cost nothing when the grid is
    trivial, mirroring the reference's rank-count-invariant sweeps,
    cnlinearcart2d.c:618-622)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import zero_velocity_bc
    from fluca_tpu.parallel.mesh import make_device_grid
    from fluca_tpu.parallel.pallas_sharded import build_poisson_sharded
    from fluca_tpu.solvers.mg import PoissonMG

    mesh = CartMesh.create((N, N))
    mesh.set_uniform_coordinates(0.0, 1.0, 0.0, 1.0)
    mg = PoissonMG(mesh, [zero_velocity_bc()] * 4, scale=1.0,
                   dtype=jnp.float32)
    lvl = mg.levels[0]
    grid = make_device_grid(2, jax.devices()[:1])
    f_sh = build_poisson_sharded(grid, lvl, mode="apply")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, N)), jnp.float32
    )
    err = float(np.max(np.abs(np.asarray(lvl.pallas_apply(x))
                              - np.asarray(f_sh(x)))))
    assert err < 1e-6, f"sharded(1x1) mismatch: {err}"
    t_un = slope_time_per_iter(lvl.pallas_apply, x, iters_lo=20,
                               iters_hi=150)
    t_sh = slope_time_per_iter(f_sh, x, iters_lo=20, iters_hi=150)
    return {"ratio": t_sh / t_un, "us_unsharded": t_un * 1e6,
            "us_sharded": t_sh * 1e6}


def main():
    r = spmv_roofline()
    frac = r["frac"]
    extra = {
        "cavity2d_256_steps_per_sec": None,
        "cavity3d_64_steps_per_sec": None,
        "channel3d_128_steps_per_sec": None,
    }
    if "--quick" not in sys.argv:
        # full-step throughputs (the perf surface where the real work
        # is; VERDICT r1 item 5): production preset, warm scan path
        try:
            extra["cavity2d_256_steps_per_sec"] = round(
                cavity_throughput(N=256, steps=50), 2
            )
            extra["cavity3d_64_steps_per_sec"] = round(
                cavity3d_throughput(N=(64, 64, 32), steps=30), 2
            )
            extra["channel3d_128_steps_per_sec"] = round(
                channel_throughput(N=128, steps=30), 2
            )
            extra["channel3d_128_bf16_steps_per_sec"] = round(
                channel_throughput(N=128, steps=30, bf16=True), 2
            )
            extra["channel3d_128_fast_steps_per_sec"] = round(
                channel_throughput(N=128, steps=30, fast=True), 2
            )
        except Exception as e:  # pragma: no cover
            extra["error"] = f"{type(e).__name__}: {e}"
        # BASELINE config #5 at stated size (own try: a VMEM/HBM
        # failure here must not discard the metrics above)
        try:
            r512 = channel512_bench()
            extra["channel512_steps_per_sec"] = r512["steps_per_sec"]
            extra["channel512_spmv_gbps"] = r512["spmv_gbps"]
            extra["channel512_mcells_per_sec"] = r512["mcells_per_sec"]
            extra["channel512_solver"] = r512["solver"]
            extra["channel512_rnorm"] = r512["ksp_rnorm"]
            extra["channel512_kernels"] = r512["kernels"]
        except Exception as e:  # pragma: no cover
            extra["channel512_error"] = f"{type(e).__name__}: {e}"
        # sharded-path hardware no-regression entry (degenerate 1x1
        # grid on the real chip; own try so a sharding failure is a
        # reported gate breach, not a lost bench)
        try:
            import jax

            if jax.devices()[0].platform == "tpu":
                s = sharded_1x1_ratio()
                extra["sharded_1x1_ratio"] = round(s["ratio"], 3)
                extra["sharded_1x1_us"] = round(s["us_sharded"], 1)
        except Exception as e:  # pragma: no cover
            extra["sharded_1x1_error"] = f"{type(e).__name__}: {e}"

    print(
        json.dumps(
            {
                "metric": "poisson_spmv_roofline_fraction",
                "value": round(frac, 4),
                "unit": (
                    f"fraction of measured copy roofline "
                    f"({r['gbps_copy']:.0f} GB/s); spmv "
                    f"{r['gbps_spmv']:.0f} GB/s at "
                    f"{r['us_per_apply']:.0f} us/apply, "
                    f"{r['N']}x{r['N']} f32; extra: full-step "
                    f"steps/s at the fixed-budget production preset"
                ),
                "vs_baseline": round(frac / 0.80, 4),
                **extra,
            }
        )
    )
    if "--quick" not in sys.argv:
        # the gate runs UNCONDITIONALLY on whatever was measured; a
        # metric missing because its variant crashed counts as a
        # breach inside check_bands (VERDICT r3 weak #3)
        if check_bands({"roofline_frac": frac, **extra}):
            sys.exit(1)


def _advance_throughput(ns, steps):
    """Warm steps/s of the scan fast path with host-sync timing.

    The sync fetch is a SCALAR device reduction, not a field
    download: jnp.sum depends on the final state so float() blocks
    until every step finished, while np.asarray(v) additionally
    downloads a full field through the tunnel INSIDE the timed
    window — at 512x256x256 that is 134 MB per advance() and was the
    "10-step batches under-report ~2x" artifact (r5 measurement:
    methodology, not device time)."""
    import time

    import jax.numpy as jnp

    ns.step()
    ns.advance(steps)  # compile the scan program
    float(jnp.sum(ns.state["v"][0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        ns.advance(steps)
        float(jnp.sum(ns.state["v"][0]))
        best = min(best, time.time() - t0)
    return steps / best


def cavity_throughput(N=256, steps=50, capped=True):
    """Cavity 2-D timesteps/sec.

    steps=50 so the one host sync per advance() amortizes below the
    per-step cost (10-step batches under-report by ~2x through the
    tunnel)."""
    from fluca_tpu.models.cavity import setup_cavity_2d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_cavity_2d(
        N=N, Re=100.0, dt=0.01, max_steps=10 * steps + 1
    )
    if capped:
        ns.impl.cfg = CNLinearConfig.production()
    return _advance_throughput(ns, steps)


def cavity3d_throughput(N=(64, 64, 32), steps=30):
    """Cavity 3-D (reference cavity_flow_3d.c config) timesteps/sec."""
    import jax.numpy as jnp

    from fluca_tpu.models.cavity import setup_cavity_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_cavity_3d(N=N, Re=100.0, dt=0.01,
                         max_steps=10 * steps + 1, dtype=jnp.float32)
    ns.impl.cfg = CNLinearConfig.production()
    return _advance_throughput(ns, steps)


def channel_throughput(N=128, steps=30, fast=False, bf16=False):
    """Turbulent-channel config 128^3 timesteps/sec (the 3-D
    full-step bandwidth story; STATUS.md perf item).

    fast=True: the production_fast preset (GCR outer + Jacobi
    momentum + V-cycle Schur — the r4 GCR outer keeps it bounded at
    any CFL where the r3 Richardson outer diverged;
    tests/test_fastpath.py).
    bf16=True: production with the bf16 ABF preconditioner
    (TUNE_BUDGET_TPU.json pins its accuracy against the converged
    solve)."""
    import jax.numpy as jnp

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_channel_3d(N=(N, N, N), dt=2e-3, max_steps=10**9,
                          dtype=jnp.float32)
    cfg = (CNLinearConfig.production_fast() if fast
           else CNLinearConfig.production())
    if bf16:
        cfg.precond_dtype = "bfloat16"
    ns.impl.cfg = cfg
    return _advance_throughput(ns, steps)


def channel512_bench(steps=20):
    """BASELINE config #5 at its stated size: turbulent channel
    512x256x256 f32 single chip (multi-host scaling of the same
    program is exercised by dryrun_multichip / bench_scaling.py).

    Reports the full production-step throughput AND the 7-point
    stencil-SpMV bandwidth at that shape (the config's own
    "halo-overlapped stencil SpMV" metric), asserting the fused
    Pallas kernels are live — no silent XLA fallback (VERDICT r2
    item 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    N = (512, 256, 256)
    # Solver combo for this shape: GCR outer + bicgstab momentum +
    # CG Schur (the wall-clustered grid makes the anisotropic
    # V-cycle a divergent Richardson iteration and breaks Jacobi
    # momentum, so the jacobi/vcycle fast selections are out). r4:
    # production() IS that combo in fixed-trip form, and the bf16
    # ABF preconditioner halves the inner-solve bytes — which at
    # this shape also DOUBLES the achievable HBM rate (f32 fields
    # are 134 MB: the >=134MB copy roofline is ~330 GB/s vs ~670
    # for the 67 MB bf16 fields, PROBE512.json). The bf16 inner
    # state is also what lets outer=3 fit in HBM (r3 had to clamp
    # to o2: 16.03G vs 15.75G; VERDICT r3 item 4).
    # dt: the r3 bench ran dt=1e-3, i.e. convective CFL ~ 12 on this
    # grid (laminar centerline u ~ 90, h_x = 4/512) — at that CFL the
    # momentum block loses diagonal dominance, every fixed-budget
    # combo under-resolves, and the driven flow silently decays
    # (exposed by the r4 retention gate below; r3's 0.556 steps/s
    # measured a collapsing flow). Throughput is dt-independent, so
    # the benchmark uses a CFL ~ 0.6 step like any production run
    # would.
    DT512 = 5e-5
    # bf16 scope "mom": momentum solves in bf16 (diagonally dominant
    # — robust), Schur stays f32 (the bf16 V-cycle on this
    # anisotropic operator is the collapse driver); the bf16
    # momentum states also free the ~1.1 GB that kept outer=3 from
    # fitting HBM in r3 (VERDICT item 4).
    # r5 (TUNE512.json + PROFILE512.json): damped-Jacobi momentum
    # sweeps replace BiCGStab inside the bf16 ABF preconditioner —
    # A = I + dt C - b L is diagonally dominant at CFL-0.6, Jacobi
    # costs 53 ms vs BiCGStab's 140 per solve at m=8 (no dots, no
    # extra A-apply) and lands BETTER per-step residuals in bf16
    # (359 vs 390 at 30 steps: BiCGStab's bf16 dot products are the
    # noise source). m=6 passes the retention + rnorm gates; Schur
    # stays CG s=6 (s=4 fails the rnorm ceiling, TUNE512).
    # r5 sweep 2 (TUNE512.json, scalar-sync timing): the o2 rnorm
    # breach was the SCHUR budget, not the outer count — o2+jac6+s8
    # matches o3/s6 solve quality (rnorm_30 350.0 vs 359) one whole
    # (mom+Schur+apply) block cheaper.
    attempts = [
        ("o2+jac6s8+bf16mom", 2, "jacobi", 6, 8, "bfloat16", "mom"),
        ("o3+jac6s6+bf16mom", 3, "jacobi", 6, 6, "bfloat16", "mom"),
        ("o3+bf16mom", 3, "bicgstab", 8, 6, "bfloat16", "mom"),
        ("o2", 2, "bicgstab", 8, 6, None, "both"),
    ]
    ns = None
    for label, outer, momsol, m, s, pdt, scope in attempts:
        try:
            ns = setup_channel_3d(N=N, dt=DT512, max_steps=10**9,
                                  stretch_y=2.0, dtype=jnp.float32)
            cfg = CNLinearConfig.production(outer, m, s)
            cfg.mom_solver = momsol
            cfg.precond_dtype = pdt
            cfg.precond_scope = scope
            ns.impl.cfg = cfg
            u0 = float(np.abs(np.asarray(ns.state["v"][0])).mean())
            ns.step()  # compiles + runs one step (OOM shows here)
            # solve-QUALITY gate, not just finiteness: on the
            # wall-clustered grid a too-weak preconditioner (the
            # bf16 V-cycle on this anisotropic operator) makes the
            # fixed-budget solve return x ~ 0 and the mean flow
            # silently decays (r4 turbulence-run lesson). 10 steps
            # must retain the driven mean flow.
            ns.advance(10)
            u1 = float(np.abs(np.asarray(ns.state["v"][0])).mean())
            if not np.isfinite(u1) or u1 < 0.9 * u0:
                raise RuntimeError(
                    f"mean flow decayed {u0:.3g}->{u1:.3g} in 10 "
                    f"steps: solver under-resolving"
                )
            solver_label = label
            break
        except Exception as e:
            print(f"channel512 {label} failed: {type(e).__name__}: "
                  f"{e}", file=sys.stderr)
            ns = None
    if ns is None:
        raise RuntimeError("channel512: every solver attempt failed")
    ops = ns.impl.ops
    # no SILENT fallback (VERDICT r2 item 3): the Poisson/MG kernels
    # (2-4 live planes) must be active at a 256x256 cross-section;
    # the momentum/chain kernels carry ~36 live planes per slab and
    # their VMEM clamps correctly refuse here (36*262KB >> 14MB), so
    # their status is REPORTED, not hidden — the momentum block runs
    # the XLA banded path at this shape until the kernels grow 2-D
    # cross-section tiling.
    lvl0 = ns.impl.mg.levels[0]
    assert lvl0.pallas_apply is not None, "poisson kernel inactive"
    chain_cause = (
        "pallas" if ops._chain3d is not None
        else "disabled (FLUCA_TPU_CHAIN3D unset; XLA fuses the "
             "chain as well — see ns/operators.py)"
        if os.environ.get("FLUCA_TPU_CHAIN3D") != "1"
        else "xla (vmem clamp at 256x256 cross-section)"
    )
    kstat = {
        "poisson": "pallas",
        # r4: the split (per-component) kernel mode lifts the r3
        # VMEM clamp at the 256x256 cross-section
        "momentum": "pallas" if ops._mom_kernel3d is not None
        else "xla (vmem clamp at 256x256 cross-section)",
        "chain": chain_cause,
    }

    sps = _advance_throughput(ns, steps)
    rnorm = float(ns.last_diag["ksp_rnorm"])

    # stencil SpMV GB/s at this shape (2 field sweeps per apply)
    x = jnp.zeros(ns.mesh.cell_shape, jnp.float32)
    t_spmv = slope_time_per_iter(lvl0.pallas_apply, x, iters_lo=20,
                                 iters_hi=120)
    bytes_moved = 2 * int(np.prod(N)) * 4
    gbps = bytes_moved / t_spmv / 1e9
    cells = int(np.prod(N))
    return {
        "steps_per_sec": round(sps, 3),
        "ms_per_step": round(1e3 / sps, 1),
        "mcells_per_sec": round(cells * sps / 1e6, 1),
        "spmv_gbps": round(gbps, 1),
        # the per-shape machine limit: >=134MB f32 buffers stream at
        # ~330 GB/s on this chip (PROBE512.json), not the ~670 GB/s
        # of <=67MB buffers — spmv_gbps is capped by that, not by
        # the kernel
        "copy_roofline_at_shape_gbps": 330.0,
        "solver": solver_label,
        "ksp_rnorm": round(rnorm, 2),
        "grid": list(N),
        "kernels": kstat,
    }


def poisson3d_roofline(N=256):
    """3-D 7-point kernel vs the same-pipeline copy roofline (run
    with --poisson3d)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import zero_velocity_bc
    from fluca_tpu.solvers.mg import PoissonMG

    dtype = jnp.float32
    mesh = CartMesh.create((N, N, N))
    mesh.set_uniform_coordinates(0, 1, 0, 1, 0, 1)
    mg = PoissonMG(mesh, [zero_velocity_bc()] * 6, scale=1.0,
                   dtype=dtype)
    lvl = mg.levels[0]
    spmv = (
        lvl.pallas_apply
        if lvl.pallas_apply is not None
        else (lambda p: mg._apply_level(lvl, p))
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    # TM must divide N or the grid misses trailing slabs (and the
    # copy "roofline" would move fewer bytes than bytes_moved assumes)
    TM = 8
    while N % TM:
        TM -= 1
    if on_tpu:
        copy_call = pl.pallas_call(
            lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
            out_shape=jax.ShapeDtypeStruct((N, N, N), dtype),
            grid=(N // TM,),
            in_specs=[
                pl.BlockSpec((TM, N, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((TM, N, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
    else:
        copy_call = lambda a: a * 1.0000001

    x = jnp.ones((N, N, N), dtype)
    t_copy = slope_time_per_iter(copy_call, x, iters_lo=20,
                                 iters_hi=150)
    t_spmv = slope_time_per_iter(spmv, x, iters_lo=20, iters_hi=150)

    bytes_moved = 2 * N**3 * np.dtype(np.float32).itemsize
    gbps_copy = bytes_moved / t_copy / 1e9
    gbps_spmv = bytes_moved / t_spmv / 1e9
    frac = gbps_spmv / gbps_copy
    print(
        json.dumps(
            {
                "metric": "poisson3d_spmv_roofline_fraction",
                "value": round(frac, 4),
                "unit": (
                    f"fraction of measured copy roofline "
                    f"({gbps_copy:.0f} GB/s); spmv {gbps_spmv:.0f} "
                    f"GB/s at {t_spmv*1e6:.0f} us/apply, {N}^3 f32"
                ),
                "vs_baseline": round(frac / 0.80, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--cavity" in sys.argv:
        print(json.dumps({
            "metric": "cavity_timesteps_per_sec",
            "value": round(cavity_throughput(), 3),
            "unit": "steps/s (256x256 f32, Re=100, capped-3)",
            "vs_baseline": None,
        }))
    elif "--channel3d" in sys.argv:
        print(json.dumps({
            "metric": "channel3d_timesteps_per_sec",
            "value": round(channel_throughput(), 3),
            "unit": "steps/s (128^3 f32, production preset)",
            "vs_baseline": None,
        }))
    elif "--channel512" in sys.argv:
        r = channel512_bench()
        print(json.dumps({
            "metric": "channel512_timesteps_per_sec",
            "value": r["steps_per_sec"],
            "unit": (
                f"steps/s (512x256x256 f32, production preset, "
                f"{r['ms_per_step']} ms/step, "
                f"{r['mcells_per_sec']} Mcells/s; stencil SpMV "
                f"{r['spmv_gbps']} GB/s at this shape)"
            ),
            "vs_baseline": None,
            **r,
        }))
    elif "--poisson3d" in sys.argv:
        poisson3d_roofline()
    else:
        main()
