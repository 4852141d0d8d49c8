"""Compare fixed-budget solver configs at the bench channel 128^3:
wall time AND achieved coupled residual (the quality metric that
justifies a fixed budget). Run on TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/tune128.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def time_cfg(tag, N=128, steps=30, **kw):
    import jax.numpy as jnp

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_channel_3d(
        N=(N, N, N), dt=2e-3, max_steps=10**9, dtype=jnp.float32
    )
    cfg = CNLinearConfig.production()
    for k, v in kw.items():
        setattr(cfg, k, v)
    ns.impl.cfg = cfg
    ns.step()
    ns.advance(steps)
    rn_warm = float(ns.last_diag["ksp_rnorm"])
    np.asarray(ns.state["v"][0])
    best = float("inf")
    rn = rn_warm
    for _ in range(3):
        t0 = time.perf_counter()
        ns.advance(steps)
        np.asarray(ns.state["v"][0])
        best = min(best, time.perf_counter() - t0)
        rn = float(ns.last_diag["ksp_rnorm"])
    ms = best / steps * 1e3
    print(f"  {tag}: {ms:7.2f} ms/step ({steps/best:5.1f} steps/s)  "
          f"max-rnorm {rn:.3e}", flush=True)
    return ms, rn


def time_cavity3d(tag, steps=40, **kw):
    import jax.numpy as jnp

    from fluca_tpu.models.cavity import setup_cavity_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_cavity_3d(N=(64, 64, 32), Re=100.0, dt=0.01,
                         max_steps=10**9, dtype=jnp.float32)
    cfg = CNLinearConfig.production()
    for k, v in kw.items():
        setattr(cfg, k, v)
    ns.impl.cfg = cfg
    ns.step()
    ns.advance(steps)
    np.asarray(ns.state["v"][0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ns.advance(steps)
        np.asarray(ns.state["v"][0])
        best = min(best, time.perf_counter() - t0)
    rn = float(ns.last_diag["ksp_rnorm"])
    print(f"  cavity3d {tag}: {best/steps*1e3:7.2f} ms/step "
          f"({steps/best:5.1f} steps/s)  max-rnorm {rn:.3e}",
          flush=True)


def compare_accuracy(N=128, steps=30):
    """End-state accuracy of candidate budget presets vs an overkill
    solve, at the bench channel config: the principled gate for
    cutting fixed budgets (rnorm alone conflates scale)."""
    import jax.numpy as jnp

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    def run(**kw):
        ns = setup_channel_3d(
            N=(N, N, N), dt=2e-3, max_steps=10**9, dtype=jnp.float32
        )
        cfg = CNLinearConfig.production()
        for k, v in kw.items():
            setattr(cfg, k, v)
        ns.impl.cfg = cfg
        ns.advance(steps)
        return [np.asarray(v) for v in ns.state["v"]] + [
            np.asarray(ns.state["p"])
        ]

    ref = run(outer_type="gcr", maxiter=6, restart=6, mom_maxiter=16,
              schur_maxiter=10)
    umax = max(np.max(np.abs(f)) for f in ref[:3])
    for tag, kw in [
        ("fgmres o3/m8/s6 (prod)", {}),
        ("gcr    o3/m6/s6       ",
         dict(outer_type="gcr", mom_maxiter=6)),
        ("gcr    o2/m10/s8      ",
         dict(outer_type="gcr", maxiter=2, restart=2, mom_maxiter=10,
              schur_maxiter=8)),
    ]:
        got = run(**kw)
        rel = max(
            float(np.max(np.abs(a - b))) for a, b in zip(got, ref)
        ) / float(umax)
        print(f"  {tag}: max|Δ|/umax vs overkill = {rel:.3e}",
              flush=True)


def main():
    print("== channel 128^3 f32, fixed-budget configs ==", flush=True)
    if "--compare" in sys.argv:
        compare_accuracy()
        return
    if "--round2" in sys.argv:
        time_cfg("gcr o3/bicg6/cg4       ", outer_type="gcr",
                 mom_maxiter=6, schur_maxiter=4)
        time_cfg("gcr o2/bicg8/cg6       ", outer_type="gcr",
                 maxiter=2, restart=2)
        time_cfg("gcr o2/bicg12/cg8      ", outer_type="gcr",
                 maxiter=2, restart=2, mom_maxiter=12,
                 schur_maxiter=8)
        time_cavity3d("gcr o3/bicg8/cg6 ", outer_type="gcr")
        time_cavity3d("gcr o3/jac8/vcyc6", outer_type="gcr",
                      mom_solver="jacobi", schur_solver="vcycle")
        time_cavity3d("gcr o3/bicg6/cg6 ", outer_type="gcr",
                      mom_maxiter=6)
        return
    time_cfg("fgmres/bicg8/cg6 (prod)")
    time_cfg("gcr   /bicg8/cg6       ", outer_type="gcr")
    time_cfg("gcr   /gcr12/cg6       ", outer_type="gcr",
             mom_solver="gcr", mom_maxiter=12)
    time_cfg("gcr   /bicg6/cg6       ", outer_type="gcr",
             mom_maxiter=6)
    time_cfg("gcr o2/bicg10/cg8      ", outer_type="gcr", maxiter=2,
             restart=2, mom_maxiter=10, schur_maxiter=8)


if __name__ == "__main__":
    main()
