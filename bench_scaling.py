"""Weak-scaling harness: sharded NS steps over growing device grids.

On a real TPU pod slice this measures the >=85% weak-scaling target
(BASELINE.md): per-device problem size fixed, device count grown, the
step jitted over a NamedSharding'd state (GSPMD emits halo
collective-permutes over ICI). On a single-chip/virtual-CPU setup it
exercises the same code path structurally.

Usage: python bench_scaling.py [--base 128] [--steps 10]
Prints one JSON line per device count.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluca_tpu.ns.cnlinear import CNLinearConfig
    from fluca_tpu.parallel.mesh import make_device_grid, shard_state

    argv = sys.argv[1:]
    base = int(argv[argv.index("--base") + 1]) if "--base" in argv else 128
    steps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv else 10

    devices = jax.devices()
    counts = []
    n = 1
    while n <= len(devices):
        counts.append(n)
        n *= 2

    results = []
    for n in counts:
        grid = make_device_grid(2, devices[:n])
        shape = tuple(grid.mesh.devices.shape)
        # weak scaling: grow the grid with the device mesh
        N = (base * shape[0], base * shape[1])
        from fluca_tpu.mesh.cart import CartMesh
        from fluca_tpu.ns.bc import BoundaryCondition, BCType, \
            zero_velocity_bc
        from fluca_tpu.ns.ns import NS

        mesh = CartMesh.create(N)
        mesh.set_uniform_coordinates(0.0, 1.0, 0.0, 1.0)
        wall = zero_velocity_bc()
        lid = BoundaryCondition(
            BCType.VELOCITY,
            velocity=lambda t, xs: (1.0 + 0.0 * xs[0], 0.0 * xs[0]),
        )
        ns = NS(mesh, rho=1.0, mu=0.01, dt=0.01, max_steps=10**9,
                bcs=[wall, wall, wall, lid], dtype=jnp.float32)
        ns.setup()
        ns.impl.cfg = CNLinearConfig.production()
        ns.state = shard_state(grid, ns.state)
        with grid.mesh:
            ns.step()
            ns.advance(steps)
            np.asarray(ns.state["v"][0])
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                ns.advance(steps)
                np.asarray(ns.state["v"][0])
                best = min(best, time.time() - t0)
        sps = steps / best
        results.append((n, N, sps))
        eff = (
            sps / results[0][2] if results else 1.0
        )  # weak scaling: ideal = constant steps/s
        print(
            json.dumps(
                {
                    "metric": "weak_scaling_steps_per_sec",
                    "devices": n,
                    "grid": list(N),
                    "value": round(sps, 3),
                    "efficiency_vs_1dev": round(eff, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
