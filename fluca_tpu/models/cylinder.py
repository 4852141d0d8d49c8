"""Cylinder wake via IBM (BASELINE.json config: "2D cylinder wake
Re=100 via IBM delta-function marker interpolation/spreading"; the
reference only has the IBM TODO at THEORY_GUIDE.md:146-148)."""

from __future__ import annotations

import numpy as np

from fluca_tpu.ibm.forcing import DirectForcingIBM
from fluca_tpu.ibm.markers import circle_markers
from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition
from fluca_tpu.ns.ns import NS
from fluca_tpu.utils import config


def setup_cylinder_2d(
    N=(128, 64),
    domain=(4.0, 2.0),
    center=(1.0, 1.0),
    diameter=0.2,
    Re=100.0,
    U_in=1.0,
    dt=5e-3,
    max_steps=100,
    kernel="roma3",
    dtype=None,
):
    """Uniform inflow (left), pressure outlet (right), symmetry
    top/bottom; stationary cylinder via direct-forcing IBM. Re is
    based on the diameter."""
    dtype = dtype or config.default_dtype()
    mesh = CartMesh.create(N)
    mesh.set_uniform_coordinates(0.0, domain[0], 0.0, domain[1])

    rho = 1.0
    mu = rho * U_in * diameter / Re

    inflow = BoundaryCondition(
        BCType.VELOCITY,
        velocity=lambda t, xs: (U_in + 0.0 * xs[1], 0.0 * xs[1]),
    )
    outflow = BoundaryCondition(
        BCType.PRESSURE_OUTLET, pressure=lambda t, xs: 0.0 * xs[1]
    )
    sym = BoundaryCondition(BCType.SYMMETRY)

    ns = NS(
        mesh, rho=rho, mu=mu, dt=dt, max_steps=max_steps, dtype=dtype,
        bcs=[inflow, outflow, sym, sym],
    )
    ns.setup()

    markers = circle_markers(
        mesh, center, diameter / 2.0, kernel=kernel, dtype=dtype
    )
    ibm = DirectForcingIBM(markers, dt)
    ns.impl.body_force = ibm.body_force

    # initialize with uniform flow
    import jax.numpy as jnp

    u0 = jnp.full(mesh.cell_shape, U_in, dtype)
    v0 = jnp.zeros(mesh.cell_shape, dtype)
    Ux0 = jnp.full(mesh.face_shape(0), U_in, dtype)
    Uy0 = jnp.zeros(mesh.face_shape(1), dtype)
    ns.set_solution(v=(u0, v0), U=(Ux0, Uy0))
    return ns, ibm


def drag_lift_coefficients(ns, ibm, U_in=1.0, diameter=0.2):
    """C_D, C_L from the IBM reaction force."""
    F = np.asarray(
        ibm.hydrodynamic_force(ns.state, ns.t, ns.rho)
    )
    qD = 0.5 * ns.rho * U_in**2 * diameter
    return float(F[0] / qD), float(F[1] / qD)
