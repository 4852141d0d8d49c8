"""Taylor-Green vortex: the NS solver's analytic correctness oracle.

Reference: fluca/tests/taylor_green_vortex/taylor_green_vortex.c.
  u(x,y,t) =  sin(x) cos(y) exp(-2 nu t)
  v(x,y,t) = -cos(x) sin(y) exp(-2 nu t)
  p(x,y,t) = (rho/4)(cos 2x + cos 2y) exp(-4 nu t)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition
from fluca_tpu.ns.ns import NS
from fluca_tpu.utils import config


def taylor_green_2d_exact(rho, mu, t, x, y):
    nu = mu / rho
    decay = jnp.exp(-2.0 * nu * t)
    u = jnp.sin(x) * jnp.cos(y) * decay
    v = -jnp.cos(x) * jnp.sin(y) * decay
    p = rho / 4.0 * (jnp.cos(2 * x) + jnp.cos(2 * y)) * decay**2
    return u, v, p


def setup_taylor_green_2d(
    N=8,
    nsteps=1,
    t_final=1.0,
    rho=1.0,
    mu=1.0,
    periodic=False,
    dtype=None,
) -> NS:
    """Build the TGV problem with the analytic initial condition set on
    all three field layouts (taylor_green_vortex.c:97-179)."""
    dtype = dtype or config.default_dtype()
    mesh = CartMesh.create((N, N), (periodic, periodic))
    mesh.set_uniform_coordinates(0.0, 2 * np.pi, 0.0, 2 * np.pi)
    dt = t_final / nsteps

    def velocity(t, xs):
        u, v, _ = taylor_green_2d_exact(rho, mu, t, xs[0], xs[1])
        return (u, v)

    if periodic:
        bc = BoundaryCondition(BCType.PERIODIC)
    else:
        bc = BoundaryCondition(BCType.VELOCITY, velocity=velocity)

    ns = NS(
        mesh, rho=rho, mu=mu, dt=dt, max_steps=nsteps, dtype=dtype,
        bcs=[bc] * 4,
    )
    ns.setup()

    cx, cy = mesh.centers(0), mesh.centers(1)
    fx, fy = mesh.face_coords(0), mesh.face_coords(1)
    Xc, Yc = jnp.meshgrid(jnp.asarray(cx), jnp.asarray(cy), indexing="ij")
    u0, v0, p0 = taylor_green_2d_exact(rho, mu, 0.0, Xc, Yc)

    Xf, Yfc = jnp.meshgrid(jnp.asarray(fx), jnp.asarray(cy), indexing="ij")
    Ux0, _, _ = taylor_green_2d_exact(rho, mu, 0.0, Xf, Yfc)
    Xcf, Yf = jnp.meshgrid(jnp.asarray(cx), jnp.asarray(fy), indexing="ij")
    _, Uy0, _ = taylor_green_2d_exact(rho, mu, 0.0, Xcf, Yf)

    ns.set_solution(
        v=(u0.astype(dtype), v0.astype(dtype)),
        U=(Ux0.astype(dtype), Uy0.astype(dtype)),
        p=p0.astype(dtype),
        phalf=jnp.zeros_like(p0, dtype),
    )
    return ns


def tgv_errors(ns: NS):
    """L2 (plain 2-norm, matching VecNorm NORM_2 in
    taylor_green_vortex.c:24-35) errors of v and p vs the analytic
    solution at the current time."""
    mesh, rho, mu, t = ns.mesh, ns.rho, ns.mu, ns.t
    cx, cy = mesh.centers(0), mesh.centers(1)
    Xc, Yc = jnp.meshgrid(jnp.asarray(cx), jnp.asarray(cy), indexing="ij")
    ue, ve, pe = taylor_green_2d_exact(rho, mu, t, Xc, Yc)
    u, v = ns.state["v"]
    p = ns.state["p"]
    v_err = jnp.sqrt(jnp.sum((u - ue) ** 2) + jnp.sum((v - ve) ** 2))
    p_err = jnp.sqrt(jnp.sum((p - pe) ** 2))
    return float(v_err), float(p_err)
