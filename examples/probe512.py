"""On-TPU probes at the BASELINE #5 shape (512x256x256 f32,
stretched-y channel grid):

1. Poisson lvl0 kernel GB/s vs a same-pipeline copy roofline — the
   r3 bench recorded 212 GB/s here vs 565-737 at 256^3 (VERDICT weak
   #2); this isolates whether that is the kernel or bench-context
   memory pressure, and sweeps the slab tile TM.
2. Split-mode momentum kernel (per-component fallback): on-device
   equivalence vs the XLA banded apply + slope timing of both.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/probe512.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import slope_time_per_iter
    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns import tables as T_
    from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
    from fluca_tpu.ns.operators import NSOperators
    from fluca_tpu.ops.pallas_stencil import (
        build_momentum_apply_3d,
        build_poisson_apply_3d,
    )
    from fluca_tpu.solvers.mg import PoissonMG

    N = (512, 256, 256)
    L = (4.0, 2.0, 2.0)
    delta, g = L[1] / 2.0, 2.0
    mesh = CartMesh.create(N, (True, False, True))
    xi = np.linspace(-1.0, 1.0, N[1] + 1)
    fy = delta * (1.0 + np.tanh(g * xi) / np.tanh(g))
    mesh.set_coordinates(
        np.linspace(0, L[0], N[0] + 1), fy,
        np.linspace(0, L[2], N[2] + 1),
    )
    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    bcs = [per, per, wall, wall, per, per]
    dtype = jnp.float32
    out = {}

    # ---- copy roofline at this shape ----------------------------------
    N0, N1, N2 = N
    TMc = 8
    copy_call = pl.pallas_call(
        lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
        out_shape=jax.ShapeDtypeStruct(N, dtype),
        grid=(N0 // TMc,),
        in_specs=[pl.BlockSpec((TMc, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TMc, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = jnp.ones(N, dtype)
    cells = int(np.prod(N))
    byts = 2 * cells * 4
    t_copy = slope_time_per_iter(copy_call, x, iters_lo=10, iters_hi=60)
    out["copy_gbps"] = round(byts / t_copy / 1e9, 1)
    print(f"copy: {out['copy_gbps']} GB/s", flush=True)

    # ---- Poisson apply, TM sweep --------------------------------------
    mg = PoissonMG(mesh, bcs, scale=2e-3, dtype=dtype)
    lvl = mg.levels[0]
    for tm in (4, 8, 16):
        try:
            ap = build_poisson_apply_3d(lvl, tile_slabs=tm)
            t = slope_time_per_iter(ap, x, iters_lo=10, iters_hi=60)
            out[f"poisson_gbps_tm{tm}"] = round(byts / t / 1e9, 1)
            print(f"poisson tm={tm}: {out[f'poisson_gbps_tm{tm}']} "
                  f"GB/s ({t*1e6:.0f} us)", flush=True)
        except Exception as e:
            out[f"poisson_gbps_tm{tm}"] = f"{type(e).__name__}: {e}"
            print(out[f"poisson_gbps_tm{tm}"], flush=True)

    # ---- split momentum kernel ----------------------------------------
    rho, mu, dt = 1.0, 1.0 / 180.0, 1e-3
    ops = NSOperators(mesh, bcs, rho=rho, mu=mu, dt=dt, dtype=dtype)
    axbcs = T_.axis_bcs(mesh, bcs)
    try:
        prep, papply = build_momentum_apply_3d(
            mesh, axbcs, rho, mu, dt, dtype
        )
    except ValueError as e:
        out["mom_split"] = f"builder refused: {e}"
        print(out["mom_split"], flush=True)
        prep = None

    rng = np.random.default_rng(3)
    v = tuple(jnp.asarray(rng.standard_normal(mesh.cell_shape),
                          dtype) for _ in range(3))
    U0 = tuple(jnp.asarray(rng.standard_normal(mesh.face_shape(d)),
                           dtype) for d in range(3))
    v0f = tuple(tuple(jnp.asarray(
        rng.standard_normal(mesh.face_shape(d)), dtype)
        for _ in range(3)) for d in range(3))

    if prep is not None:
        factors = jax.jit(prep)(U0, v0f)
        got = jax.jit(papply)(v, factors)
        ref = jax.jit(lambda vv: ops.apply_A(vv, U0, v0f))(v)
        errs = []
        for c in range(3):
            gc_, rc = np.asarray(got[c]), np.asarray(ref[c])
            errs.append(float(np.abs(gc_ - rc).max()
                              / max(np.abs(rc).max(), 1e-30)))
        out["mom_split_relerr"] = errs
        print(f"split mom rel errs: {errs}", flush=True)
        assert max(errs) < 1e-4, errs

        fx = jax.jit(lambda vv: papply(vv, factors))
        t_pal = slope_time_per_iter(fx, v, iters_lo=5, iters_hi=30)
        out["mom_split_ms"] = round(t_pal * 1e3, 3)
        out["mom_split_gbps_30stream"] = round(
            30 * cells * 4 / t_pal / 1e9, 1
        )
        print(f"split mom: {t_pal*1e3:.2f} ms "
              f"({out['mom_split_gbps_30stream']} GB/s of 30-stream "
              f"model)", flush=True)
        fref = jax.jit(lambda vv: ops.apply_A(vv, U0, v0f))
        t_xla = slope_time_per_iter(fref, v, iters_lo=5, iters_hi=30)
        out["mom_xla_ms"] = round(t_xla * 1e3, 3)
        print(f"xla mom: {t_xla*1e3:.2f} ms (speedup "
              f"{t_xla/t_pal:.2f}x)", flush=True)

    with open("/root/repo/PROBE512.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
