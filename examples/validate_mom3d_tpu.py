"""On-TPU validation + timing of the fused 3-D momentum A-apply.

Compares the Pallas kernel against the XLA banded apply_A on-device
(channel 128^3 config) and times both with the slope method.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import slope_time_per_iter
    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns import tables as T_
    from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
    from fluca_tpu.ns.operators import NSOperators
    from fluca_tpu.ops.pallas_stencil import build_momentum_apply_3d

    N = tuple(int(x) for x in (sys.argv[1:4] or [128, 128, 128]))
    wall = zero_velocity_bc()
    per = BoundaryCondition(BCType.PERIODIC)
    bcs = [per, per, wall, wall, per, per]
    mesh = CartMesh.create(N, (True, False, True))
    mesh.set_uniform_coordinates(0, 4, 0, 2, 0, 2)
    dtype = jnp.float32
    rho, mu, dt = 1.0, 5e-3, 2e-3
    ops = NSOperators(mesh, bcs, rho=rho, mu=mu, dt=dt, dtype=dtype)
    axbcs = T_.axis_bcs(mesh, bcs)
    prep, papply = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype
    )

    rng = np.random.default_rng(3)
    v = tuple(jnp.asarray(rng.standard_normal(mesh.cell_shape), dtype)
              for _ in range(3))
    U0 = tuple(jnp.asarray(rng.standard_normal(mesh.face_shape(d)),
                           dtype) for d in range(3))
    v0f = tuple(tuple(jnp.asarray(
        rng.standard_normal(mesh.face_shape(d)), dtype)
        for _ in range(3)) for d in range(3))

    factors = jax.jit(prep)(U0, v0f)
    got = jax.jit(papply)(v, factors)
    ref = jax.jit(lambda v: ops.apply_A(v, U0, v0f))(v)
    for c in range(3):
        g, r = np.asarray(got[c]), np.asarray(ref[c])
        err = np.abs(g - r).max() / max(np.abs(r).max(), 1e-30)
        print(f"comp {c}: max rel err {err:.3e}")
        assert err < 5e-6, err

    fx = jax.jit(lambda vv: papply(vv, factors))
    t_pal = slope_time_per_iter(fx, v, iters_lo=20, iters_hi=150)
    fref = jax.jit(lambda vv: ops.apply_A(vv, U0, v0f))
    t_xla = slope_time_per_iter(fref, v, iters_lo=20, iters_hi=150)
    cells = int(np.prod(N))
    bw = 18 * cells * 4 / t_pal / 1e9
    print(f"pallas A-apply: {t_pal*1e6:8.1f} us  ({bw:.0f} GB/s eff, "
          f"18-stream model)")
    print(f"xla    A-apply: {t_xla*1e6:8.1f} us  (speedup "
          f"{t_xla/t_pal:.2f}x)")


if __name__ == "__main__":
    main()
