"""Non-uniform-grid NS solve: wall-refined cavity (the stretched-grid
coefficient paths of every operator, end-to-end)."""

import numpy as np

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ns.ns import NS


def tanh_stretch(N, beta=1.5):
    """Wall-clustered face distribution on [0, 1]."""
    s = np.linspace(-1.0, 1.0, N + 1)
    f = np.tanh(beta * s) / np.tanh(beta)
    return 0.5 * (f + 1.0)


def test_cavity_on_stretched_grid():
    N = 24
    mesh = CartMesh.create((N, N))
    mesh.set_coordinates(tanh_stretch(N), tanh_stretch(N))
    wall = zero_velocity_bc()
    lid = BoundaryCondition(
        BCType.VELOCITY,
        velocity=lambda t, xs: (1.0 + 0.0 * xs[0], 0.0 * xs[0]),
    )
    ns = NS(mesh, rho=1.0, mu=0.01, dt=0.05, max_steps=8,
            bcs=[wall, wall, wall, lid])
    ns.solve()
    assert bool(ns.last_diag["converged"])
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u)) and np.max(np.abs(u)) < 1.5
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4
    # lid drag visible in the top row
    assert u[N // 2, -1] > 0.2
