"""Real-TPU validation of the fused chain kernels (ops/pallas_chain3d):
Mosaic-compile at 128^3, numerics vs the XLA banded path, and full-step
throughput with/without the chain stages.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/validate_chain3d_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# chain kernels are opt-in since the 128^3 slope measurement showed
# the XLA path faster (see ns/operators.py); this script validates
# them, so force-enable
os.environ["FLUCA_TPU_CHAIN3D"] = "1"

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ns = setup_channel_3d(N=(N, N, N), dt=2e-3, max_steps=10**9,
                          dtype=jnp.float32)
    ops = ns.impl.ops
    chain = ops._chain3d
    assert chain is not None, "chain3d kernel not built on TPU"
    mesh = ns.mesh

    rng = np.random.default_rng(0)
    v = tuple(
        jnp.asarray(rng.standard_normal(mesh.cell_shape), jnp.float32)
        for _ in range(3)
    )
    U = tuple(
        jnp.asarray(rng.standard_normal(mesh.face_shape(d)),
                    jnp.float32)
        for d in range(3)
    )
    p = jnp.asarray(rng.standard_normal(mesh.cell_shape), jnp.float32)
    Av = tuple(
        jnp.asarray(rng.standard_normal(mesh.cell_shape), jnp.float32)
        for _ in range(3)
    )

    # numerics vs banded
    Gp = ops.apply_G(p)
    Tv = ops.apply_T(v)
    Rp = ops.apply_R(p)
    want_U = [np.asarray(U[d] - Tv[d] - Rp[d]) for d in range(3)]
    want_v = [np.asarray(Av[c] + Gp[c]) for c in range(3)]
    want_p = np.asarray(ops.apply_D(U))
    gv, gU, gp_ = chain.coupled(Av, v, U, p)
    errs = []
    for c in range(3):
        errs.append(np.max(np.abs(np.asarray(gv[c]) - want_v[c])))
        errs.append(np.max(np.abs(np.asarray(gU[c]) - want_U[c])))
    errs.append(np.max(np.abs(np.asarray(gp_) - want_p)))
    print(f"coupled max err: {max(errs):.3e}", flush=True)
    assert max(errs) < 5e-5, errs

    Ustar, rp2 = chain.abf_pre(v, U, p)
    want_Ust = [np.asarray(U[d] + Tv[d]) for d in range(3)]
    want_rp = np.asarray(
        p - ops.apply_D(tuple(U[d] + Tv[d] for d in range(3)))
    )
    scale_rp = float(np.max(np.abs(want_rp)))
    e = max(
        max(np.max(np.abs(np.asarray(Ustar[d]) - want_Ust[d]))
            for d in range(3)),
        np.max(np.abs(np.asarray(rp2) - want_rp)) / scale_rp,
    )
    print(f"abf_pre max err (rel for rp): {e:.3e}", flush=True)
    assert e < 5e-5

    gv2, gU2 = chain.abf_post(v, U, p)
    Gstp = ops.apply_Gst(p)
    e = max(
        max(np.max(np.abs(np.asarray(gv2[c])
                          - np.asarray(v[c] - Gp[c])))
            for c in range(3)),
        max(np.max(np.abs(np.asarray(gU2[d])
                          - np.asarray(U[d] - Gstp[d])))
            for d in range(3)),
    )
    print(f"abf_post max err: {e:.3e}", flush=True)
    assert e < 5e-5

    # full-step timing with/without the chain
    def throughput(use_chain, steps=30):
        ns2 = setup_channel_3d(N=(N, N, N), dt=2e-3, max_steps=10**9,
                               dtype=jnp.float32)
        if not use_chain:
            ns2.impl.ops._chain3d = None
        cfg = CNLinearConfig.production()
        cfg.outer_type = "gcr"
        ns2.impl.cfg = cfg
        ns2.step()
        ns2.advance(steps)
        np.asarray(ns2.state["v"][0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ns2.advance(steps)
            np.asarray(ns2.state["v"][0])
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e3

    t_chain = throughput(True)
    t_plain = throughput(False)
    print(f"gcr o3/m8/s6 step: chain {t_chain:.2f} ms  "
          f"banded {t_plain:.2f} ms  speedup {t_plain/t_chain:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
