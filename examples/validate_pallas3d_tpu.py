"""Validate the 3-D Pallas Poisson kernel on real TPU hardware.

Compares the fused Mosaic kernel against the XLA banded path on a
stretched 3-D grid with mixed BCs, and reports effective bandwidth.
Run: FLUCA_TPU_PALLAS_3D=1 python examples/validate_pallas3d_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["FLUCA_TPU_PALLAS_3D"] = "1"


def slope_time_per_iter(fn, x, iters_lo=10, iters_hi=40):
    import jax
    import jax.numpy as jnp
    from jax import lax

    ts = {}
    for iters in (iters_lo, iters_hi):
        g = jax.jit(
            lambda x, it=iters: jnp.sum(
                lax.fori_loop(0, it, lambda i, a: fn(a), x)
            )
        )
        float(g(x))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[iters_hi] - ts[iters_lo]) / (iters_hi - iters_lo)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import zero_velocity_bc
    from fluca_tpu.solvers.mg import PoissonMG

    print("platform:", jax.devices()[0].platform, flush=True)
    dtype = jnp.float32
    results = []
    for N in [(64, 64, 64), (128, 128, 128), (256, 256, 256)]:
        mesh = CartMesh.create(N)
        lo_hi = []
        for _ in range(3):
            lo_hi += [0.0, 1.0]
        mesh.set_uniform_coordinates(*lo_hi)
        bcs = [zero_velocity_bc()] * 6
        mg = PoissonMG(mesh, bcs, scale=1.0, dtype=dtype)
        lvl = mg.levels[0]
        rng = np.random.default_rng(7)
        p = jnp.asarray(rng.standard_normal(N), dtype)

        # XLA banded path as the reference
        def xla_apply(p, lvl=lvl, mg=mg):
            saved, lvl.pallas_apply = lvl.pallas_apply, None
            try:
                return mg._apply_level(lvl, p)
            finally:
                lvl.pallas_apply = saved

        ref = np.asarray(jax.jit(xla_apply)(p))
        if lvl.pallas_apply is None:
            print(f"N={N}: pallas kernel NOT built (size gate?)",
                  flush=True)
            continue
        got = np.asarray(lvl.pallas_apply(p))
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-30)
        print(f"N={N}: apply max rel err = {err:.3e}", flush=True)
        assert err < 5e-6, f"mismatch at {N}"

        b = jnp.asarray(rng.standard_normal(N), dtype)
        if lvl.pallas_residual is not None:
            got_r = np.asarray(lvl.pallas_residual(p, b))
            ref_r = np.asarray(b) - ref
            err_r = np.max(np.abs(got_r - ref_r)) / max(
                np.max(np.abs(ref_r)), 1e-30)
            print(f"N={N}: residual max rel err = {err_r:.3e}",
                  flush=True)
            assert err_r < 5e-6
        if lvl.pallas_smooth is not None:
            got_s = np.asarray(lvl.pallas_smooth(p, b, lvl.inv_diag))
            ref_s = np.asarray(p) + 0.8 * np.asarray(lvl.inv_diag) * (
                np.asarray(b) - ref)
            err_s = np.max(np.abs(got_s - ref_s)) / max(
                np.max(np.abs(ref_s)), 1e-30)
            print(f"N={N}: smooth max rel err = {err_s:.3e}",
                  flush=True)
            assert err_s < 5e-6

        nelem = int(np.prod(N))
        bytes_moved = 2 * nelem * 4
        t_pal = slope_time_per_iter(lvl.pallas_apply, p)
        t_xla = slope_time_per_iter(jax.jit(xla_apply), p)
        results.append(
            {
                "N": N,
                "pallas_gbps": round(bytes_moved / t_pal / 1e9, 1),
                "xla_gbps": round(bytes_moved / t_xla / 1e9, 1),
                "speedup": round(t_xla / t_pal, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
