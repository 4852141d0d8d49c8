"""Plane Poiseuille channel flow (BASELINE.json config: "2D
channel/Poiseuille flow with inflow-outflow BCs").

Analytic steady state: u(y) = 4 U_max y (H - y) / H^2, v = 0,
p(x) = 8 mu U_max (L - x) / H^2 (zero at the outlet).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ns.ns import NS
from fluca_tpu.utils import config


def poiseuille_exact(mu, U_max, L, H):
    def u(y):
        return 4.0 * U_max * y * (H - y) / H**2

    def p(x):
        return 8.0 * mu * U_max * (L - x) / H**2

    return u, p


def setup_channel_2d(
    N=(64, 32),
    L=2.0,
    H=1.0,
    U_max=1.0,
    mu=0.05,
    dt=0.02,
    max_steps=50,
    exact_init=True,
    dtype=None,
):
    dtype = dtype or config.default_dtype()
    mesh = CartMesh.create(N)
    mesh.set_uniform_coordinates(0.0, L, 0.0, H)
    rho = 1.0
    u_ex, p_ex = poiseuille_exact(mu, U_max, L, H)

    inflow = BoundaryCondition(
        BCType.VELOCITY,
        velocity=lambda t, xs: (u_ex(xs[1]) + 0.0 * xs[0], 0.0 * xs[1]),
    )
    outflow = BoundaryCondition(
        BCType.PRESSURE_OUTLET, pressure=lambda t, xs: 0.0 * xs[1]
    )
    wall = zero_velocity_bc()

    ns = NS(
        mesh, rho=rho, mu=mu, dt=dt, max_steps=max_steps, dtype=dtype,
        bcs=[inflow, outflow, wall, wall],
    )
    ns.setup()

    if exact_init:
        cx, cy = mesh.centers(0), mesh.centers(1)
        fx, fy = mesh.face_coords(0), mesh.face_coords(1)
        _, Yc = np.meshgrid(cx, cy, indexing="ij")
        Xc, _ = np.meshgrid(cx, cy, indexing="ij")
        u0 = u_ex(Yc)
        p0 = p_ex(Xc)
        _, Ycf = np.meshgrid(fx, cy, indexing="ij")
        Ux0 = u_ex(Ycf)
        Uy0 = np.zeros(mesh.face_shape(1))
        ns.set_solution(
            v=(jnp.asarray(u0, dtype), jnp.zeros(mesh.cell_shape, dtype)),
            U=(jnp.asarray(Ux0, dtype), jnp.asarray(Uy0, dtype)),
            p=jnp.asarray(p0, dtype),
            phalf=jnp.asarray(p0, dtype),
        )
    return ns
