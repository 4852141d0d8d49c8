"""FD tutorials: small PDE solvers built on the operator algebra.

Reference: fluca/tutorials/fd/ex1.c-ex4.c — each returns its solution
and performs the same physics self-checks the reference encodes with
PetscCheck (boundedness, TVD property, conservation).

  ex1: 1-D steady convection-diffusion (the reference solves with
       SNES; linear problem -> one Krylov solve here)
  ex2: 1-D unsteady convection with TVD limiter (TS/SSP -> SSP-RK3)
  ex3: 2-D unsteady convection-diffusion (TS -> SSP-RK3)
  ex4: 1-D viscous Burgers via scale-by-field nonlinearity
       (FlucaFDScaleSetVector per step -> ScaledFieldOp)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ops.fd import (
    FDBC,
    FDBCType,
    ScaledFieldOp,
    derivative,
    fd_scale,
    fd_sum,
)
from fluca_tpu.ops.tvd import TVDOp
from fluca_tpu.solvers.krylov import bicgstab


def _ssp_rk3(rhs, u, dt, nsteps):
    """Shu-Osher SSP-RK3 (the TSSSP scheme the reference tutorials
    use)."""

    @jax.jit
    def step(u):
        u1 = u + dt * rhs(u)
        u2 = 0.75 * u + 0.25 * (u1 + dt * rhs(u1))
        return u / 3.0 + 2.0 / 3.0 * (u2 + dt * rhs(u2))

    for _ in range(nsteps):
        u = step(u)
    return u


def ex1_steady_convection_diffusion(N=64, u_vel=1.0, gamma=0.05):
    """u dphi/dx = Gamma d2phi/dx2, phi(0)=0, phi(1)=1.
    Analytic: (exp(u x / G) - 1) / (exp(u / G) - 1)."""
    m = CartMesh.create((N,))
    m.set_uniform_coordinates(0.0, 1.0)
    bcs = [FDBC(FDBCType.DIRICHLET, 0.0), FDBC(FDBCType.DIRICHLET, 1.0)]
    conv = fd_scale(derivative(m, 0, 1, 2, bcs=bcs), u_vel)
    diff = fd_scale(derivative(m, 0, 2, 2, bcs=bcs), gamma)

    def op(phi):
        return conv.apply(phi, include_const=False) - diff.apply(
            phi, include_const=False
        )

    # move the bc constant terms to the rhs: op(phi) = -(const terms)
    zero = jnp.zeros(N, jnp.float64)
    rhs = -(conv.apply(zero) - diff.apply(zero))
    res = bicgstab(op, rhs, rtol=1e-10, maxiter=500)
    phi = np.asarray(res.x)

    c = m.centers(0)
    exact = (np.exp(u_vel * c / gamma) - 1.0) / (
        np.exp(u_vel / gamma) - 1.0
    )
    # self-checks: boundedness + accuracy
    assert phi.min() > -1e-8 and phi.max() < 1.0 + 1e-8
    assert np.max(np.abs(phi - exact)) < 0.05
    return phi, exact


def ex2_unsteady_convection_tvd(N=128, limiter="vanleer", cfl=0.4,
                                t_final=0.25):
    """dphi/dt + u dphi/dx = 0 (u=1, periodic): advect a step profile
    with a TVD flux; self-check: min/max bounds preserved (TVD)."""
    m = CartMesh.create((N,), (True,))
    m.set_uniform_coordinates(0.0, 1.0)
    x = m.centers(0)
    h = 1.0 / N
    dt = cfl * h
    nsteps = int(t_final / dt)
    tvd = TVDOp(m, 0, limiter=limiter)
    vel = jnp.ones(N)

    def rhs(phi):
        flux = tvd.apply(phi, vel) * vel  # face flux u*phi_face
        return -(jnp.roll(flux, -1) - flux) / h

    phi0 = jnp.asarray(np.where((x > 0.25) & (x < 0.5), 1.0, 0.0))
    phi = _ssp_rk3(rhs, phi0, dt, nsteps)
    phi = np.asarray(phi)
    # TVD self-checks: boundedness + mass conservation
    assert phi.min() > -1e-10 and phi.max() < 1.0 + 1e-10
    np.testing.assert_allclose(phi.sum(), float(phi0.sum()), rtol=1e-10)
    return phi


def ex3_convection_diffusion_2d(N=32, u=(1.0, 0.5), gamma=0.01,
                                t_final=0.1, cfl=0.3,
                                limiter="vanleer"):
    """dphi/dt + div(u phi) = Gamma lap(phi), periodic; TVD convective
    fluxes keep the solution bounded (the reference's ex3 uses the
    secondordertvd operator for convection)."""
    m = CartMesh.create((N, N), (True, True))
    m.set_uniform_coordinates(0.0, 1.0, 0.0, 1.0)
    h = 1.0 / N
    dt = min(cfl * h / max(abs(u[0]), abs(u[1])), 0.2 * h * h / gamma)
    nsteps = max(int(t_final / dt), 1)
    tvx = TVDOp(m, 0, limiter=limiter)
    tvy = TVDOp(m, 1, limiter=limiter)
    velx = jnp.full((N, N), u[0])
    vely = jnp.full((N, N), u[1])
    lap = fd_sum(derivative(m, 0, 2, 2), derivative(m, 1, 2, 2))

    def rhs(phi):
        fx = u[0] * tvx.apply(phi, velx)
        fy = u[1] * tvy.apply(phi, vely)
        conv = (jnp.roll(fx, -1, 0) - fx) / h + (
            jnp.roll(fy, -1, 1) - fy
        ) / h
        return -conv + gamma * lap.apply(phi)

    cx, cy = m.centers(0), m.centers(1)
    X, Y = np.meshgrid(cx, cy, indexing="ij")
    phi0 = jnp.asarray(np.exp(
        -((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.01
    ))
    phi = _ssp_rk3(rhs, phi0, dt, nsteps)
    phi = np.asarray(phi)
    # diffusion + advection conserve mass (periodic) and reduce max
    np.testing.assert_allclose(
        phi.sum(), float(phi0.sum()), rtol=1e-8
    )
    assert phi.max() < float(phi0.max())
    assert phi.min() > -1e-8
    return phi


def ex4_viscous_burgers(N=128, nu=0.01, t_final=0.3, cfl=0.3):
    """dphi/dt + phi dphi/dx = nu d2phi/dx2 (periodic), nonlinearity
    via runtime scale-by-field (reference tutorials/fd/ex4.c +
    FlucaFDScaleSetVector)."""
    m = CartMesh.create((N,), (True,))
    m.set_uniform_coordinates(0.0, 1.0)
    h = 1.0 / N
    x = m.centers(0)
    d1 = derivative(m, 0, 1, 2)
    d2 = derivative(m, 0, 2, 2)
    conv = ScaledFieldOp(d1)

    def rhs(phi):
        conv.set_field(phi)  # phi * dphi/dx
        return -conv(phi) + nu * d2.apply(phi)

    phi0 = jnp.asarray(1.0 + 0.5 * np.sin(2 * np.pi * x))
    dt = cfl * h / 1.5
    nsteps = int(t_final / dt)
    phi = _ssp_rk3(rhs, phi0, dt, nsteps)
    phi = np.asarray(phi)
    # Burgers with viscosity: bounded by initial range, mass conserved
    assert phi.min() > 0.5 - 1e-6 and phi.max() < 1.5 + 1e-6
    np.testing.assert_allclose(phi.mean(), 1.0, rtol=1e-6)
    return phi
