"""Benchmark: pressure-Poisson stencil SpMV roofline fraction per chip.

Primary metric (BASELINE.json north star): the -D*Gst stencil apply
(the pressure-Poisson operator, the hot kernel of every time step) as
a fraction of the chip's HBM-bandwidth roofline. Target >= 0.80.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


HBM_GBPS = {
    # chip generation -> HBM bandwidth (GB/s)
    "v5 lite": 819.0,  # TPU v5e
    "v5litepod": 819.0,
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def detect_hbm_gbps(dev) -> float:
    kind = getattr(dev, "device_kind", "").lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import zero_velocity_bc
    from fluca_tpu.solvers.mg import PoissonMG

    dev = jax.devices()[0]
    bw_peak = detect_hbm_gbps(dev)

    N = 4096
    dtype = jnp.float32
    mesh = CartMesh.create((N, N))
    mesh.set_uniform_coordinates(0.0, 1.0, 0.0, 1.0)
    bcs = [zero_velocity_bc()] * 4
    mg = PoissonMG(mesh, bcs, scale=1.0, dtype=dtype)

    op = mg.apply_op  # vol .* (-D Gst p): the Poisson SpMV

    iters = 50

    @jax.jit
    def run(x):
        return lax.fori_loop(0, iters, lambda i, x: op(x), x)

    x = jnp.ones((N, N), dtype)
    # warmup / compile
    run(x).block_until_ready()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        times.append((time.perf_counter() - t0) / iters)
    t = min(times)

    # minimum HBM traffic: read input + write output (coefficients are
    # 1-D broadcasts, negligible)
    bytes_moved = 2 * N * N * np.dtype(np.float32).itemsize
    gbps = bytes_moved / t / 1e9
    frac = gbps / bw_peak

    print(
        json.dumps(
            {
                "metric": "poisson_spmv_roofline_fraction",
                "value": round(frac, 4),
                "unit": f"fraction of {bw_peak:.0f} GB/s HBM roofline "
                        f"({gbps:.0f} GB/s, {N}x{N} f32, "
                        f"{t*1e6:.0f} us/apply)",
                "vs_baseline": round(frac / 0.80, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
