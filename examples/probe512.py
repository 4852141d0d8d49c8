"""On-TPU probes at the BASELINE #5 shape (512x256x256 f32):

1. Copy-roofline anatomy: the r4 first probe measured the PURE COPY
   at only 326 GB/s at this shape (vs ~670 GB/s at 4096^2 / 256^3),
   so the r3 "Poisson at 30% of roofline" verdict item was measured
   against the wrong roofline. Sweep copy TM + a 256^3 control to
   localize the cliff.
2. Split-mode momentum kernel: full-fusion vs split equivalence ON
   TPU at (512,128,256) (both modes build there), then split timing
   at (512,256,256). The XLA banded reference at this size crashes
   the remote-compile transport, so Pallas-vs-Pallas is the
   hardware check (interpret-mode CI covers Pallas-vs-XLA).

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/probe512.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def copy_probe(shape, TM, out, label):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import slope_time_per_iter

    N0 = shape[0]
    blk = (TM,) + shape[1:]
    idx = (lambda i: (i, 0, 0)) if len(shape) == 3 else (
        lambda i: (i, 0)
    )
    call = pl.pallas_call(
        lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        grid=(N0 // TM,),
        in_specs=[pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
    )
    x = jnp.ones(shape, jnp.float32)
    byts = 2 * int(np.prod(shape)) * 4
    t = slope_time_per_iter(call, x, iters_lo=20, iters_hi=120)
    out[label] = round(byts / t / 1e9, 1)
    print(f"{label}: {out[label]} GB/s", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import slope_time_per_iter
    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns import tables as T_
    from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
    from fluca_tpu.ops.pallas_stencil import build_momentum_apply_3d

    out = {}

    # ---- copy-roofline anatomy ---------------------------------------
    # size-vs-shape controls: 134 MB arrays in three shapes, a 67 MB
    # 3-D control, and a 268 MB 2-D control (TM=32 blocks at a
    # 256x256 cross-section OOM VMEM: 2 x double-buffered 8 MB)
    for TM in (8, 16):
        copy_probe((512, 256, 256), TM, out, f"copy512_tm{TM}")
    copy_probe((256, 256, 256), 8, out, "copy256cube_tm8")
    copy_probe((8192, 4096), 256, out, "copy134MB_2d")
    copy_probe((16384, 4096), 256, out, "copy268MB_2d")
    copy_probe((4096, 4096), 128, out, "copy67MB_2d")

    # ---- split vs full momentum kernel at (512,128,256) --------------
    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    bcs = [per, per, wall, wall, per, per]
    dtype = jnp.float32
    rho, mu, dt = 1.0, 1.0 / 180.0, 1e-3

    def mk(N):
        mesh = CartMesh.create(N, (True, False, True))
        delta, g = 1.0, 2.0
        xi = np.linspace(-1.0, 1.0, N[1] + 1)
        fy = delta * (1.0 + np.tanh(g * xi) / np.tanh(g))
        mesh.set_coordinates(
            np.linspace(0, 4, N[0] + 1), fy,
            np.linspace(0, 2, N[2] + 1),
        )
        axbcs = T_.axis_bcs(mesh, bcs)
        rng = np.random.default_rng(3)
        v = tuple(jnp.asarray(
            rng.standard_normal(mesh.cell_shape), dtype)
            for _ in range(3))
        U0 = tuple(jnp.asarray(
            rng.standard_normal(mesh.face_shape(d)), dtype)
            for d in range(3))
        v0f = tuple(tuple(jnp.asarray(
            rng.standard_normal(mesh.face_shape(d)), dtype)
            for _ in range(3)) for d in range(3))
        return mesh, axbcs, v, U0, v0f

    mesh, axbcs, v, U0, v0f = mk((512, 128, 256))
    prep_f, ap_f = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype
    )
    prep_s, ap_s = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype, force_split=True
    )
    Ff = jax.jit(prep_f)(U0, v0f)
    got_f = jax.jit(ap_f)(v, Ff)
    got_s = jax.jit(ap_s)(v, jax.jit(prep_s)(U0, v0f))
    errs = []
    for c in range(3):
        a, b = np.asarray(got_f[c]), np.asarray(got_s[c])
        errs.append(float(np.abs(a - b).max()
                          / max(np.abs(a).max(), 1e-30)))
    out["split_vs_full_relerr_512x128"] = errs
    print(f"split vs full rel errs: {errs}", flush=True)
    assert max(errs) < 1e-5, errs

    # time with factors as loop-carried state, NOT closure constants:
    # 0.8 GB of embedded factor constants blows the remote-compile
    # transport (HTTP 413)
    def timed(ap, v, factors, cells):
        fn = lambda vf: (ap(vf[0], vf[1]), vf[1])
        from bench import slope_time_per_iter
        return slope_time_per_iter(fn, (v, factors), iters_lo=5,
                                   iters_hi=30)

    t_f = timed(ap_f, v, Ff, int(np.prod(mesh.N)))
    out["mom_full_512x128_ms"] = round(t_f * 1e3, 3)
    print(f"full mom (512,128,256): {t_f*1e3:.2f} ms", flush=True)

    # ---- split timing at the BASELINE #5 shape ------------------------
    mesh, axbcs, v, U0, v0f = mk((512, 256, 256))
    try:
        prep, papply = build_momentum_apply_3d(
            mesh, axbcs, rho, mu, dt, dtype
        )
        factors = jax.jit(prep)(U0, v0f)
        got = jax.jit(papply)(v, factors)
        for c in range(3):
            assert np.isfinite(np.asarray(got[c])).all()
        t_pal = timed(papply, v, factors, int(np.prod(mesh.N)))
        cells = int(np.prod(mesh.N))
        out["mom_split_512_ms"] = round(t_pal * 1e3, 3)
        out["mom_split_512_gbps_30stream"] = round(
            30 * cells * 4 / t_pal / 1e9, 1
        )
        print(f"split mom (512,256,256): {t_pal*1e3:.2f} ms "
              f"({out['mom_split_512_gbps_30stream']} GB/s of "
              f"30-stream model)", flush=True)
    except Exception as e:
        out["mom_split_512"] = f"{type(e).__name__}: {e}"
        print(out["mom_split_512"], flush=True)

    with open("/root/repo/PROBE512.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
