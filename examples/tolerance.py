"""Reference accuracy-contract demonstration at flagship sizes
(VERDICT r4 missing #1): the reference's default stopping rule is
KSP rtol 1e-5 on the unpreconditioned residual every step
(/root/reference/fluca/src/ns/interface/nssol.c:22-25). This script

1. runs the TOLERANCE-based fgmres path (reference semantics) at
   128^3 and at 512x256x256, recording steps/s, outer iterations and
   the achieved relative residual, and
2. maps every production fixed-budget preset to its EFFECTIVE
   per-step rtol (ksp_rnorm / ||rhs||) at both shapes — converting
   "fixed budgets are fine" from assertion to measurement — including
   the f32-vs-bf16mom rnorm pair at the true 512 shape (r4 weak #3).

Writes TOLERANCE.json.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/tolerance.py
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def run_config(N, cfg, label, nsteps=10, dt=None):
    import jax.numpy as jnp

    from fluca_tpu.models.channel import setup_channel_3d

    cfg.diag_rhs_norm = True
    ns = setup_channel_3d(
        N=N, dt=dt, max_steps=10**9, stretch_y=2.0,
        dtype=jnp.float32,
    )
    ns.impl.cfg = cfg
    rec = {"label": label, "N": list(N), "dt": dt}
    try:
        u0 = float(np.abs(np.asarray(ns.state["v"][0])).mean())
        t0 = time.time()
        ns.step()
        rec["compile_s"] = round(time.time() - t0, 1)
        rels, its = [], []
        t0 = time.time()
        for _ in range(nsteps):
            ns.step()
            d = ns.last_diag
            rels.append(float(d["ksp_rnorm"])
                        / max(float(d["rhs_norm"]), 1e-30))
            its.append(int(d["ksp_iters"]))
        wall = time.time() - t0
        u1 = float(np.abs(np.asarray(ns.state["v"][0])).mean())
        rec.update({
            "steps_per_sec": round(nsteps / wall, 3),
            "outer_iters": its,
            "achieved_rtol_per_step": [f"{r:.2e}" for r in rels],
            "achieved_rtol_last": float(f"{rels[-1]:.3e}"),
            "ksp_rnorm_last": round(float(ns.last_diag["ksp_rnorm"]),
                                    3),
            "rhs_norm_last": round(float(ns.last_diag["rhs_norm"]),
                                   3),
            "retention": round(u1 / u0, 4),
        })
    except Exception as e:
        rec["error"] = f"{type(e).__name__}: {e}"
    finally:
        del ns
        gc.collect()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    results = {"note": (
        "achieved_rtol = ksp_rnorm / ||rhs|| per step (the "
        "reference's unpreconditioned relative residual, "
        "nssol.c:24-25). Tolerance rows run the while-loop fgmres "
        "path with rtol 1e-5; production rows are fixed-budget "
        "presets whose effective rtol is being measured. "
        "steps/s here uses per-step host syncs (diagnostics "
        "readback) - NOT comparable to the scan-fast-path bench "
        "numbers."), "rows": []}

    def save():
        with open("/root/repo/TOLERANCE.json", "w") as f:
            json.dump(results, f, indent=1)

    N128 = (128, 128, 128)
    DT128 = 2e-3  # the bench dt (CFL ~ 0.9 at laminar centerline)

    # -- 128^3 ---------------------------------------------------------
    cfg = CNLinearConfig()  # reference defaults: fgmres rtol 1e-5
    results["rows"].append(
        run_config(N128, cfg, "tol1e-5_fgmres_128", dt=DT128)
    )
    save()
    results["rows"].append(run_config(
        N128, CNLinearConfig.production(), "production_o3m8s6_128",
        dt=DT128,
    ))
    save()
    c = CNLinearConfig.production()
    c.precond_dtype = "bfloat16"
    c.precond_scope = "mom"
    results["rows"].append(
        run_config(N128, c, "production_o3m8s6_bf16mom_128", dt=DT128)
    )
    save()
    results["rows"].append(run_config(
        N128, CNLinearConfig.production_fast(),
        "production_fast_gcr_128", dt=DT128,
    ))
    save()

    # -- 512x256x256 (BASELINE #5 shape) ------------------------------
    N512 = (512, 256, 256)
    DT512 = 5e-5  # CFL ~ 0.6 (bench.py channel512)

    # tolerance path: restart clamped by HBM (each coupled basis
    # vector is 7 x 134 MB; fgmres keeps ~2*restart of them)
    cfg = CNLinearConfig()
    cfg.restart = 4
    cfg.maxiter = 12
    results["rows"].append(
        run_config(N512, cfg, "tol1e-5_fgmres_r4_512", nsteps=3,
                   dt=DT512)
    )
    save()
    # the f32-vs-bf16mom pair at the true shape, same budgets (o2
    # fits HBM in f32; o3 f32 does not - r3 measurement)
    results["rows"].append(run_config(
        N512, CNLinearConfig.production(2, 8, 6),
        "production_o2m8s6_f32_512", dt=DT512,
    ))
    save()
    c = CNLinearConfig.production(2, 8, 6)
    c.precond_dtype = "bfloat16"
    c.precond_scope = "mom"
    results["rows"].append(run_config(
        N512, c, "production_o2m8s6_bf16mom_512", dt=DT512,
    ))
    save()
    c = CNLinearConfig.production(3, 8, 6)
    c.precond_dtype = "bfloat16"
    c.precond_scope = "mom"
    results["rows"].append(run_config(
        N512, c, "production_o3m8s6_bf16mom_512", dt=DT512,
    ))
    save()


if __name__ == "__main__":
    main()
