"""Multigrid-preconditioned pressure-Poisson solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.solvers.krylov import cg
from fluca_tpu.solvers.mg import PoissonMG


def make_mg(N, periodic=False, dim=2):
    m = CartMesh.create((N,) * dim, (periodic,) * dim)
    m.set_uniform_coordinates(*([0.0, 1.0] * dim))
    if periodic:
        bc = BoundaryCondition(BCType.PERIODIC)
    else:
        bc = zero_velocity_bc()
    bcs = [bc] * (2 * dim)
    mg = PoissonMG(m, bcs, scale=1.0, dtype=jnp.float64)
    return m, mg


@pytest.mark.parametrize("periodic", [True, False])
def test_mg_preconditioned_cg_convergence(periodic):
    N = 64
    m, mg = make_mg(N, periodic)
    assert len(mg.levels) >= 2
    c = m.centers(0)
    X, Y = np.meshgrid(c, c, indexing="ij")
    # solvable rhs (zero mean)
    rhs = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)

    def proj(x):
        return x - jnp.mean(x)

    b = mg.scale_rhs(jnp.asarray(rhs))
    res = cg(
        mg.apply_op, b, rtol=1e-10, maxiter=100,
        M=mg.precondition, project=proj,
    )
    assert bool(res.converged)
    # MG-preconditioned CG should converge fast (mesh-independent)
    assert int(res.iters) < 25
    # verify solution: -div(grad p) = rhs  (uniform grid: exact
    # 5-point residual check)
    x = np.asarray(res.x)
    h = 1.0 / N
    lap = np.zeros_like(x)
    if periodic:
        lap = (
            np.roll(x, 1, 0) + np.roll(x, -1, 0)
            + np.roll(x, 1, 1) + np.roll(x, -1, 1) - 4 * x
        ) / h**2
        np.testing.assert_allclose(-lap, rhs, atol=1e-6)


def test_mg_vs_plain_cg_iterations():
    """MG preconditioning must give a large iteration reduction."""
    N = 64
    m, mg = make_mg(N, periodic=False)
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal((N, N))
    rhs -= rhs.mean()

    def proj(x):
        return x - jnp.mean(x)

    b = mg.scale_rhs(jnp.asarray(rhs))
    res_plain = cg(mg.apply_op, b, rtol=1e-8, maxiter=2000, project=proj)
    res_mg = cg(mg.apply_op, b, rtol=1e-8, maxiter=2000,
                M=mg.precondition, project=proj)
    assert int(res_mg.iters) * 4 < int(res_plain.iters)


def test_mg_3d_smoke():
    N = 16
    m, mg = make_mg(N, periodic=True, dim=3)
    rng = np.random.default_rng(1)
    rhs = rng.standard_normal((N, N, N))
    rhs -= rhs.mean()

    def proj(x):
        return x - jnp.mean(x)

    b = mg.scale_rhs(jnp.asarray(rhs))
    res = cg(mg.apply_op, b, rtol=1e-8, maxiter=200,
             M=mg.precondition, project=proj)
    assert bool(res.converged)
    assert int(res.iters) < 30


def test_mg_chebyshev_smoother():
    import jax.numpy as jnp
    import numpy as np

    from fluca_tpu.solvers.krylov import cg

    m, _ = make_mg(32, periodic=False)
    mg = PoissonMG(m, [zero_velocity_bc()] * 4, scale=1.0,
                   dtype=jnp.float64, smoother="chebyshev")
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal((32, 32))
    rhs -= rhs.mean()

    def proj(x):
        return x - jnp.mean(x)

    res = cg(mg.apply_op, mg.scale_rhs(jnp.asarray(rhs)), rtol=1e-8,
             maxiter=100, M=mg.precondition, project=proj)
    assert bool(res.converged) and int(res.iters) < 25
