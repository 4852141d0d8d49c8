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
