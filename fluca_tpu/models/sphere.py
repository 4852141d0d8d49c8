"""3-D flow past a sphere via IBM (BASELINE.json config: "3D flow
past sphere, 128^3 grid, multigrid-preconditioned Poisson, CGNS
checkpoint I/O")."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fluca_tpu.ibm.forcing import DirectForcingIBM
from fluca_tpu.ibm.markers import sphere_markers
from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition
from fluca_tpu.ns.ns import NS
from fluca_tpu.utils import config


def setup_sphere_3d(
    N=(64, 32, 32),
    domain=(4.0, 2.0, 2.0),
    center=(1.0, 1.0, 1.0),
    diameter=0.4,
    Re=100.0,
    U_in=1.0,
    dt=1e-2,
    max_steps=50,
    kernel="roma3",
    dtype=None,
    retract=0.0,
):
    dtype = dtype or config.default_dtype()
    mesh = CartMesh.create(N)
    mesh.set_uniform_coordinates(
        0.0, domain[0], 0.0, domain[1], 0.0, domain[2]
    )
    rho = 1.0
    mu = rho * U_in * diameter / Re

    inflow = BoundaryCondition(
        BCType.VELOCITY,
        velocity=lambda t, xs: (
            U_in + 0.0 * xs[1], 0.0 * xs[1], 0.0 * xs[1]
        ),
    )
    outflow = BoundaryCondition(
        BCType.PRESSURE_OUTLET, pressure=lambda t, xs: 0.0 * xs[1]
    )
    sym = BoundaryCondition(BCType.SYMMETRY)

    ns = NS(
        mesh, rho=rho, mu=mu, dt=dt, max_steps=max_steps, dtype=dtype,
        bcs=[inflow, outflow, sym, sym, sym, sym],
    )
    ns.setup()

    markers = sphere_markers(
        mesh, center, diameter / 2.0, kernel=kernel, dtype=dtype,
        retract=retract,
    )
    ibm = DirectForcingIBM(markers, dt)
    ns.impl.body_force = ibm.body_force

    u0 = jnp.full(mesh.cell_shape, U_in, dtype)
    # distinct buffers: the jitted step donates its inputs, and one
    # buffer must not be donated twice
    z0 = jnp.zeros(mesh.cell_shape, dtype)
    z1 = jnp.zeros(mesh.cell_shape, dtype)
    ns.set_solution(
        v=(u0, z0, z1),
        U=(
            jnp.full(mesh.face_shape(0), U_in, dtype),
            jnp.zeros(mesh.face_shape(1), dtype),
            jnp.zeros(mesh.face_shape(2), dtype),
        ),
    )
    return ns, ibm
