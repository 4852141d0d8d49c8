"""Pallas stencil kernels in interpreter mode (CI coverage on CPU;
bit-exactness vs the XLA banded path is also verified on real TPU by
the bench pipeline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ops.pallas_stencil import (
    build_poisson_apply_2d,
    build_poisson_apply_3d,
    build_poisson_residual_2d,
    build_poisson_residual_3d,
    build_poisson_smooth_2d,
    build_poisson_smooth_3d,
)
from fluca_tpu.solvers.mg import PoissonMG


def make_mg(N, periodic, dim=2):
    m = CartMesh.create((N,) * dim if isinstance(N, int) else N,
                        (periodic,) * dim)
    m.set_uniform_coordinates(*([0.0, 1.0] * dim))
    bc = (
        BoundaryCondition(BCType.PERIODIC)
        if periodic
        else zero_velocity_bc()
    )
    return m, PoissonMG(m, [bc] * (2 * dim), scale=1.0,
                        dtype=jnp.float32)


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_2d_matches_xla(periodic):
    m, mg = make_mg(128, periodic)
    f = build_poisson_apply_2d(mg.levels[0], tile_rows=32,
                               interpret=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((128, 128)),
        jnp.float32,
    )
    ref = np.asarray(mg.apply_op(x))
    got = np.asarray(f(x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_3d_matches_xla(periodic):
    m, mg = make_mg((16, 16, 128), periodic, dim=3)
    f = build_poisson_apply_3d(mg.levels[0], tile_slabs=8,
                               interpret=True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 16, 128)),
        jnp.float32,
    )
    ref = np.asarray(mg.apply_op(x))
    got = np.asarray(f(x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_2d_residual_smooth(periodic):
    m, mg = make_mg(128, periodic)
    lvl = mg.levels[0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)

    res = build_poisson_residual_2d(lvl, tile_rows=32, interpret=True)
    ref_r = np.asarray(b - mg.apply_op(x))
    np.testing.assert_allclose(np.asarray(res(x, b)), ref_r,
                               rtol=2e-5, atol=1e-5)

    sm = build_poisson_smooth_2d(lvl, 0.8, tile_rows=32,
                                 interpret=True)
    ref_s = np.asarray(x + 0.8 * lvl.inv_diag * (b - mg.apply_op(x)))
    np.testing.assert_allclose(np.asarray(sm(x, b, lvl.inv_diag)),
                               ref_s, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_3d_residual_smooth(periodic):
    m, mg = make_mg((16, 16, 128), periodic, dim=3)
    lvl = mg.levels[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 16, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 16, 128)), jnp.float32)

    res = build_poisson_residual_3d(lvl, tile_slabs=8, interpret=True)
    ref_r = np.asarray(b - mg.apply_op(x))
    np.testing.assert_allclose(np.asarray(res(x, b)), ref_r,
                               rtol=2e-5, atol=1e-5)

    sm = build_poisson_smooth_3d(lvl, 0.8, tile_slabs=8,
                                 interpret=True)
    ref_s = np.asarray(x + 0.8 * lvl.inv_diag * (b - mg.apply_op(x)))
    np.testing.assert_allclose(np.asarray(sm(x, b, lvl.inv_diag)),
                               ref_s, rtol=2e-5, atol=1e-5)


def test_pallas_3d_stretched_grid():
    """Non-uniform coordinates exercise the separable coefficient
    planes (W1/W2/H12) for real."""
    m = CartMesh.create((16, 16, 128))
    f0 = np.linspace(0.0, 1.0, 17) ** 1.3
    f1 = np.linspace(0.0, 1.0, 17) ** 0.8
    f2 = np.linspace(0.0, 2.0, 129) ** 1.1
    m.set_coordinates(f0, f1, f2)
    mg = PoissonMG(m, [zero_velocity_bc()] * 6, scale=1.0,
                   dtype=jnp.float32)
    f = build_poisson_apply_3d(mg.levels[0], tile_slabs=8,
                               interpret=True)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((16, 16, 128)),
        jnp.float32,
    )
    ref = np.asarray(mg.apply_op(x))
    got = np.asarray(f(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
