"""On-TPU validation of the bf16 kernel instances used by the bf16
ABF preconditioner (precond_dtype): bf16 momentum A-apply and bf16
PoissonMG V-cycle vs their f32 counterparts at channel 128^3.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
      python examples/validate_bf16_tpu.py
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
    from fluca_tpu.ops.pallas_stencil import build_momentum_apply_3d
    from fluca_tpu.solvers.mg import PoissonMG

    N = (128, 128, 128)
    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    bcs = [per, per, wall, wall, per, per]
    mesh = CartMesh.create(N, (True, False, True))
    mesh.set_uniform_coordinates(0, 4, 0, 2, 0, 2)
    rho, mu, dt = 1.0, 1.0 / 180.0, 2e-3
    axbcs = T_.axis_bcs(mesh, bcs)

    rng = np.random.default_rng(3)
    v32 = tuple(
        jnp.asarray(rng.standard_normal(mesh.cell_shape), jnp.float32)
        for _ in range(3)
    )
    U0 = tuple(
        jnp.asarray(rng.standard_normal(mesh.face_shape(d)),
                    jnp.float32)
        for d in range(3)
    )
    v0f = tuple(tuple(
        jnp.asarray(rng.standard_normal(mesh.face_shape(d)),
                    jnp.float32)
        for _ in range(3)) for d in range(3))

    # f32 reference kernel
    prep32, ap32 = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, jnp.float32
    )
    F32 = jax.jit(prep32)(U0, v0f)
    ref = jax.jit(ap32)(v32, F32)

    # bf16 kernel on bf16-cast inputs
    prep16, ap16 = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, jnp.bfloat16
    )
    F16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), F32
    )
    v16 = tuple(x.astype(jnp.bfloat16) for x in v32)
    got = jax.jit(ap16)(v16, F16)
    for c in range(3):
        g = np.asarray(got[c], np.float32)
        r = np.asarray(ref[c], np.float32)
        rel = np.abs(g - r).max() / max(np.abs(r).max(), 1e-30)
        print(f"mom comp {c}: rel err {rel:.3e}")
        # bf16: 8-bit mantissa; ~20-term sums of N(0,1) products
        # cancel, so pointwise max-rel-err ~1e-1 is the honest bound
        assert rel < 0.15, rel

    t16 = slope_time_per_iter(
        lambda vf: (ap16(vf[0], vf[1]), vf[1]), (v16, F16),
        iters_lo=20, iters_hi=120,
    )
    t32 = slope_time_per_iter(
        lambda vf: (ap32(vf[0], vf[1]), vf[1]), (v32, F32),
        iters_lo=20, iters_hi=120,
    )
    print(f"mom A-apply: f32 {t32*1e3:.3f} ms, bf16 {t16*1e3:.3f} ms "
          f"({t32/t16:.2f}x)")

    # bf16 MG V-cycle
    mg32 = PoissonMG(mesh, bcs, scale=dt / rho, dtype=jnp.float32)
    mg16 = PoissonMG(mesh, bcs, scale=dt / rho, dtype=jnp.bfloat16)
    b = jnp.asarray(
        rng.standard_normal(mesh.cell_shape), jnp.float32
    )
    z32 = np.asarray(jax.jit(mg32.precondition)(b), np.float32)
    z16 = np.asarray(
        jax.jit(mg16.precondition)(b.astype(jnp.bfloat16)),
        np.float32,
    )
    rel = np.abs(z16 - z32).max() / max(np.abs(z32).max(), 1e-30)
    print(f"V-cycle rel err: {rel:.3e}")
    assert np.isfinite(z16).all()
    assert rel < 0.1, rel
    tv16 = slope_time_per_iter(
        jax.jit(mg16.precondition), b.astype(jnp.bfloat16),
        iters_lo=20, iters_hi=120,
    )
    tv32 = slope_time_per_iter(
        jax.jit(mg32.precondition), b, iters_lo=20, iters_hi=120
    )
    print(f"V-cycle: f32 {tv32*1e3:.3f} ms, bf16 {tv16*1e3:.3f} ms "
          f"({tv32/tv16:.2f}x)")
    print("OK")


if __name__ == "__main__":
    main()
