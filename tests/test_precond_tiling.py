"""Reduced-precision preconditioner kernel tiling (advisor r4 high).

The 3-D momentum kernel's prepped factors are TILE-LAYOUT-DEPENDENT:
FE0[i] = lo[(i+1)*TM] (ops/pallas_stencil.build_momentum_apply_3d),
so factors built by a kernel with one TM are silently WRONG when fed
to a kernel built with a different TM — exactly what happened when
_precond_ctx cast the f32 kernel's factors to bf16 (the bf16 kernel
picks a larger TM because its planes are half-size). These tests fence
(a) the mechanism and (b) the cnlinear wiring that now rebuilds the
factors with the reduced-precision kernel's own prep.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns import tables as T_
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ns.operators import NSOperators
from fluca_tpu.ops.pallas_stencil import build_momentum_apply_3d

wall = zero_velocity_bc()
per = BoundaryCondition(BCType.PERIODIC)


def _setup(N=(16, 16, 128)):
    mesh = CartMesh.create(N, (True, False, True))
    mesh.set_uniform_coordinates(0, 1, 0, 1, 0, 1)
    bcs = [per, per, wall, wall, per, per]
    axbcs = T_.axis_bcs(mesh, bcs)
    return mesh, bcs, axbcs


def _rand_state(rng, mesh, dtype):
    v = tuple(
        jnp.asarray(rng.standard_normal(mesh.cell_shape), dtype)
        for _ in range(3)
    )
    U0 = tuple(
        jnp.asarray(rng.standard_normal(mesh.face_shape(d)), dtype)
        for d in range(3)
    )
    v0f = tuple(
        tuple(
            jnp.asarray(rng.standard_normal(mesh.face_shape(d)), dtype)
            for _ in range(3)
        )
        for d in range(3)
    )
    return v, U0, v0f


def test_factors_are_tile_layout_dependent():
    """Factors prepped with TM=4 fed to a TM=8 kernel give WRONG
    answers (the pre-fix failure mode), while each kernel consuming
    its OWN prep matches the XLA banded reference exactly."""
    mesh, bcs, axbcs = _setup()
    dtype = jnp.float64
    rho, mu, dt = 1.3, 0.02, 0.01
    ops = NSOperators(mesh, bcs, rho=rho, mu=mu, dt=dt, dtype=dtype)

    prep4, apply4 = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype, interpret=True, tile_slabs=4
    )
    prep8, apply8 = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype, interpret=True, tile_slabs=8
    )

    rng = np.random.default_rng(5)
    v, U0, v0f = _rand_state(rng, mesh, dtype)
    ref = ops.apply_A(v, U0, v0f)

    f4, f8 = prep4(U0, v0f), prep8(U0, v0f)
    # the layouts genuinely differ (ntiles 4 vs 2)
    assert f4["FE0"][0].shape != f8["FE0"][0].shape

    for apply_k, fac in ((apply4, f4), (apply8, f8)):
        got = apply_k(v, fac)
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(got[c]), np.asarray(ref[c]),
                rtol=0, atol=1e-12,
            )

    # cross-feeding the TM=4 FE0 planes to the TM=8 kernel (the exact
    # pre-fix failure: the kernel reads FE0[i] for i < its own ntiles,
    # getting lo[4]/lo[8] instead of lo[8]/hilast) must NOT match; if
    # it ever does, the layouts stopped being tile-dependent and the
    # rebuild-with-own-prep plumbing can be simplified away
    fx = dict(f8)
    fx["FE0"] = f4["FE0"]
    got_bad = apply8(v, fx)
    err = max(
        float(jnp.max(jnp.abs(got_bad[c] - ref[c])))
        for c in range(3)
    )
    assert err > 1e-8, (
        "cross-tiled factors unexpectedly matched; tiling-dependence "
        "assumption changed"
    )


def test_precond_ctx_rebuilds_factors_with_own_prep(monkeypatch):
    """_precond_ctx must hand the reduced-precision kernel factors
    built by ITS OWN prep (not the solver-dtype factors cast): with
    interpret-mode kernels forced to different tilings, the ctx's
    applyA must still match the XLA banded apply to reduced-precision
    tolerance."""
    import fluca_tpu.ns.cnlinear as cn
    import fluca_tpu.ops.pallas_stencil as ps
    from fluca_tpu.ns.cnlinear import CNLinearConfig, CNLinearSolver

    mesh, bcs, axbcs = _setup()
    rho, mu, dt = 1.0, 0.01, 0.005

    real_build = ps.build_momentum_apply_3d

    def fake_build(mesh_, axbcs_, rho_, mu_, dt_, dtype_, **kw):
        # force interpret mode (CPU) and a dtype-dependent tiling:
        # the "f32" kernel gets TM=4, the reduced-precision twin TM=8
        kw.pop("interpret", None)
        kw.pop("tile_slabs", None)
        tm = 8 if jnp.dtype(dtype_).itemsize < 4 else 4
        return real_build(
            mesh_, axbcs_, rho_, mu_, dt_, dtype_,
            interpret=True, tile_slabs=tm, **kw
        )

    monkeypatch.setattr(ps, "pallas_available", lambda: True)
    monkeypatch.setattr(ps, "build_momentum_apply_3d", fake_build)

    cfg = CNLinearConfig.production(2, 2, 2)
    cfg.precond_dtype = "bfloat16"
    cfg.precond_scope = "mom"
    solver = CNLinearSolver(
        mesh, bcs, rho, mu, dt, cfg=cfg, dtype=jnp.float32
    )
    solver.ops._build_kernels()  # rebuild under the monkeypatch
    assert solver.ops._mom_kernel3d is not None
    assert solver.ops.kernel_status["mom3d"] == "live"

    rng = np.random.default_rng(7)
    v, U0, v0f = _rand_state(rng, mesh, jnp.float32)
    Acoeffs = solver.ops.build_momentum_factors_3d(U0, v0f)
    diagA = solver.ops.diag_A(U0, v0f)

    ctx = solver._precond_ctx(Acoeffs, diagA, U0=U0, v0f=v0f)
    assert ctx is not None
    # the ctx factors carry the bf16 kernel's OWN tile layout
    # (ntiles=2 at TM=8), not the f32 kernel's (ntiles=4)
    assert ctx["Acoeffs"]["FE0"][0].shape[0] == 2
    assert ctx["Acoeffs"]["FU"][0].dtype == jnp.bfloat16

    ref = solver.ops.apply_A(v, U0, v0f)
    got = ctx["applyA"](tuple(x.astype(jnp.bfloat16) for x in v))
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(got[c], np.float32), np.asarray(ref[c]),
            rtol=0.05, atol=0.05,
        )


def test_precond_dtype_rejects_tolerance_solves():
    """precond_dtype + tolerance-based inner solves is an unsupported
    combination (the while-loop forms cannot carry bf16 trees); it
    must fail with a clear error, not a trace-time crash."""
    from fluca_tpu.ns.cnlinear import CNLinearConfig, CNLinearSolver

    mesh, bcs, _ = _setup((8, 8, 8))
    cfg = CNLinearConfig()  # tolerance-based defaults
    cfg.precond_dtype = "bfloat16"
    solver = CNLinearSolver(
        mesh, bcs, 1.0, 0.01, 0.005, cfg=cfg, dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="fixed-budget"):
        solver._pre_resources()
