"""Real-TPU validation of the shard_map'd Poisson kernels
(parallel/pallas_sharded): on the single tunneled chip, a 1-device
grid must (a) produce the same numbers as the unsharded Pallas
kernels and (b) show no throughput regression (VERDICT r2 item 1
"done" criterion).

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/validate_sharded_tpu.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_time_per_iter
from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.parallel.mesh import make_device_grid
from fluca_tpu.parallel.pallas_sharded import build_poisson_sharded
from fluca_tpu.solvers.mg import PoissonMG


def check(dim, N, periodic):
    mesh = CartMesh.create(N, periodic)
    mesh.set_uniform_coordinates(*([0.0, 1.0] * dim))
    bcs = []
    for d in range(dim):
        bc = (
            BoundaryCondition(BCType.PERIODIC)
            if periodic[d]
            else zero_velocity_bc()
        )
        bcs += [bc, bc]
    mg = PoissonMG(mesh, bcs, scale=1.0, dtype=jnp.float32)
    lvl = mg.levels[0]
    assert lvl.pallas_apply is not None, "unsharded kernel missing"
    grid = make_device_grid(dim, jax.devices()[:1])
    f_sh = build_poisson_sharded(grid, lvl, mode="apply")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(N), jnp.float32
    )
    a = np.asarray(lvl.pallas_apply(x))
    b = np.asarray(f_sh(x))
    err = float(np.max(np.abs(a - b)))
    t_un = slope_time_per_iter(lvl.pallas_apply, x, iters_lo=20,
                               iters_hi=150)
    t_sh = slope_time_per_iter(f_sh, x, iters_lo=20, iters_hi=150)
    print(
        f"{dim}-D {N} per={periodic}: max|diff|={err:.3e}  "
        f"unsharded {t_un*1e6:.1f} us  sharded(1-dev) "
        f"{t_sh*1e6:.1f} us  ratio {t_sh/t_un:.3f}",
        flush=True,
    )
    assert err == 0.0 or err < 1e-6, err
    return t_sh / t_un


def main():
    r1 = check(2, (2048, 2048), (False, False))
    r2 = check(3, (128, 128, 128), (True, False, True))
    ok = r1 < 1.15 and r2 < 1.15
    print(f"sharded/unsharded ratios: 2d={r1:.3f} 3d={r2:.3f} "
          f"{'OK' if ok else 'REGRESSION'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
