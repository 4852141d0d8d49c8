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


def setup_channel_3d(
    N=(64, 32, 32),
    L=(4.0, 2.0, 2.0),
    utau=1.0,
    Re_tau=180.0,
    dt=2e-3,
    max_steps=10,
    perturb=0.1,
    perturb_mode="noise",
    stretch_y=None,
    dtype=None,
):
    """Turbulent channel configuration (BASELINE.json config #5:
    "3D turbulent channel ... on multi-host pod slice"): periodic
    streamwise (x) and spanwise (z), no-slip walls in y, flow driven
    by the constant mean-pressure-gradient body force f_x =
    rho utau^2 / delta (the standard closed-channel forcing). The
    grid shards over a device mesh exactly like every other field
    (fluca_tpu.parallel)."""
    import jax.numpy as jnp

    dtype = dtype or config.default_dtype()
    delta = L[1] / 2.0
    rho = 1.0
    mu = rho * utau * delta / Re_tau

    mesh = CartMesh.create(N, (True, False, True))
    if stretch_y is None:
        mesh.set_uniform_coordinates(0, L[0], 0, L[1], 0, L[2])
    else:
        # tanh wall clustering in y (standard channel-DNS grid):
        # y_j = delta (1 + tanh(g(2j/N - 1)) / tanh(g)); g ~ 1.5-2.5.
        # The non-uniform coefficient tables handle this exactly
        # (Vandermonde construction, reference derivative.c:84-107).
        g = float(stretch_y)
        xi = np.linspace(-1.0, 1.0, N[1] + 1)
        if abs(g) < 1e-12:
            fy = delta * (1.0 + xi)  # g -> 0 limit: uniform spacing
        else:
            fy = delta * (1.0 + np.tanh(g * xi) / np.tanh(g))
        fx = np.linspace(0, L[0], N[0] + 1)
        fz = np.linspace(0, L[2], N[2] + 1)
        mesh.set_coordinates(fx, fy, fz)

    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    ns = NS(
        mesh, rho=rho, mu=mu, dt=dt, max_steps=max_steps, dtype=dtype,
        bcs=[per, per, wall, wall, per, per],
    )
    ns.setup()
    fx = rho * utau**2 / delta
    ns.impl.body_force = lambda state, t: (
        jnp.full(mesh.cell_shape, fx, dtype),
        jnp.zeros(mesh.cell_shape, dtype),
        jnp.zeros(mesh.cell_shape, dtype),
    )

    # laminar-profile initial condition + perturbation
    cy = mesh.centers(1)
    u_lam = (
        Re_tau / 2.0 * utau * (1.0 - ((cy - delta) / delta) ** 2)
    )
    rng = np.random.default_rng(0)
    u0 = np.broadcast_to(
        u_lam[None, :, None], mesh.cell_shape
    ).copy()
    v0 = np.zeros(mesh.cell_shape)
    w0 = np.zeros(mesh.cell_shape)
    if perturb_mode == "noise":
        # white noise on u: seeds transition at coarse resolutions
        # (64^3: dx+ = 11, noise decay rate nu*k_grid^2 ~ 14/t-unit,
        # transition wins) but NOT at fine ones (128^3: rate ~57 —
        # the noise is viscously annihilated before it can grow;
        # measured r5: E_turb 6.2 -> 5e-7 within t=0.5)
        u0 *= 1.0 + perturb * rng.standard_normal(mesh.cell_shape)
    elif perturb_mode == "rolls":
        # resolution-robust transition seed: large-scale streamwise
        # rolls (divergence-free, from a vector potential psi) +
        # low-wavenumber streaks + small noise. Decay rate nu*k^2 ~
        # 0.06/t-unit at these wavenumbers, so lift-up + streak
        # breakdown have time to act at any grid (standard channel-
        # DNS initialization practice; cf. minimal-flow-unit
        # transition seeding, Jimenez & Moin 1991).
        cx = mesh.centers(0)
        cz = mesh.centers(2)
        X = cx[:, None, None]
        Y = cy[None, :, None]
        Z = cz[None, None, :]
        eta = Y / delta                       # 0..2, walls at 0/2
        f = eta**2 * (2.0 - eta) ** 2         # f, f' vanish at walls
        fp = 2.0 * eta * (2.0 - eta) * (2.0 - 2.0 * eta) / delta
        beta = 2.0 * np.pi * 2.0 / L[2]       # 2 roll pairs across z
        alpha = 2.0 * np.pi / L[0]            # x modulation (3-D)
        s = perturb / 0.2
        a_roll = 2.0 * utau * s
        b_streak = 8.0 * utau * s
        xmod = 1.0 + 0.3 * np.sin(alpha * X)
        # psi = (a/beta) f(y) sin(beta z) * xmod:
        #   v = d(psi)/dz, w = -d(psi)/dy  (div-free in y-z for any
        #   x-modulation; u has no x-dependence, so div u' = 0)
        v0 += a_roll * f * np.cos(beta * Z) * xmod
        w0 += -(a_roll / beta) * fp * np.sin(beta * Z) * xmod
        u0 += b_streak * f * np.cos(beta * Z + 0.7)
        u0 *= 1.0 + 0.05 * s * rng.standard_normal(mesh.cell_shape)
    else:
        raise ValueError(f"unknown perturb_mode {perturb_mode!r}")
    ns.set_solution(
        v=(
            jnp.asarray(u0, dtype),
            jnp.asarray(v0, dtype),
            jnp.asarray(w0, dtype),
        ),
        U=(
            jnp.asarray(
                np.broadcast_to(
                    u_lam[None, :, None], mesh.face_shape(0)
                ),
                dtype,
            ),
            jnp.zeros(mesh.face_shape(1), dtype),
            jnp.zeros(mesh.face_shape(2), dtype),
        ),
    )
    return ns


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
