"""3-D NS solver tests (reference: cnlinearcart3d.c + cavity_flow_3d.c).
The per-axis table design makes 3-D structural; these tests prove it
numerically."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ns.ns import NS


def setup_tgv_3d(N=8, nsteps=2, t_final=0.1, rho=1.0, mu=1.0):
    """2-D Taylor-Green extruded in z (w = 0, no z-dependence): an
    exact 3-D solution; periodic all around."""
    mesh = CartMesh.create((N, N, 4), (True, True, True))
    mesh.set_uniform_coordinates(
        0, 2 * np.pi, 0, 2 * np.pi, 0, 2 * np.pi
    )
    bc = BoundaryCondition(BCType.PERIODIC)
    ns = NS(mesh, rho=rho, mu=mu, dt=t_final / nsteps,
            max_steps=nsteps, bcs=[bc] * 6)
    ns.setup()

    def exact(t, x, y):
        nu = mu / rho
        decay = np.exp(-2 * nu * t)
        return (
            np.sin(x) * np.cos(y) * decay,
            -np.cos(x) * np.sin(y) * decay,
            rho / 4 * (np.cos(2 * x) + np.cos(2 * y)) * decay**2,
        )

    cx, cy, cz = [mesh.centers(d) for d in range(3)]
    fx, fy, fz = [mesh.face_coords(d) for d in range(3)]
    X, Y, _ = np.meshgrid(cx, cy, cz, indexing="ij")
    u0, v0, p0 = exact(0.0, X, Y)
    Xf, Yc, _ = np.meshgrid(fx, cy, cz, indexing="ij")
    Ux0, _, _ = exact(0.0, Xf, Yc)
    Xc, Yf, _ = np.meshgrid(cx, fy, cz, indexing="ij")
    _, Uy0, _ = exact(0.0, Xc, Yf)
    w0 = np.zeros_like(u0)
    Uz0 = np.zeros(mesh.face_shape(2))

    ns.set_solution(
        v=tuple(jnp.asarray(a) for a in (u0, v0, w0)),
        U=tuple(jnp.asarray(a) for a in (Ux0, Uy0, Uz0)),
        p=jnp.asarray(p0),
        phalf=jnp.zeros_like(jnp.asarray(p0)),
    )
    return ns, exact


def test_tgv3d_accuracy_and_divergence():
    ns, exact = setup_tgv_3d(N=8, nsteps=2, t_final=0.1)
    ns.solve()
    assert bool(ns.last_diag["converged"])
    cx, cy, cz = [ns.mesh.centers(d) for d in range(3)]
    X, Y, _ = np.meshgrid(cx, cy, cz, indexing="ij")
    ue, ve, pe = exact(ns.t, X, Y)
    u = np.asarray(ns.state["v"][0])
    w = np.asarray(ns.state["v"][2])
    rms_u = np.sqrt(np.mean((u - ue) ** 2))
    assert rms_u < 0.02, rms_u
    assert np.max(np.abs(w)) < 1e-5  # z-velocity stays zero
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4


def test_cavity3d_with_symmetry_plane():
    """3-D cavity with a SYMMETRY back plane (reference
    cavity_flow_3d.c:30-39,61-76)."""
    mesh = CartMesh.create((12, 12, 6))
    mesh.set_uniform_coordinates(0, 1, 0, 1, 0, 0.5)
    wall = zero_velocity_bc()
    lid = BoundaryCondition(
        BCType.VELOCITY,
        velocity=lambda t, xs: (
            1.0 + 0.0 * xs[0], 0.0 * xs[0], 0.0 * xs[0]
        ),
    )
    sym = BoundaryCondition(BCType.SYMMETRY)
    # left,right,down,up,back(z lo),front(z hi)
    ns = NS(mesh, rho=1.0, mu=0.01, dt=0.05, max_steps=3,
            bcs=[wall, wall, wall, lid, sym, wall])
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))
    assert np.max(np.abs(u)) < 1.5
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4


def test_tgv3d_second_order_rate():
    """2nd-order convergence in 3-D (extruded TGV)."""
    errs = []
    for N, nsteps in ((8, 4), (16, 8)):
        ns, exact = setup_tgv_3d(N=N, nsteps=nsteps, t_final=0.2)
        ns.solve()
        cx, cy, cz = [ns.mesh.centers(d) for d in range(3)]
        X, Y, _ = np.meshgrid(cx, cy, cz, indexing="ij")
        ue, _, _ = exact(ns.t, X, Y)
        u = np.asarray(ns.state["v"][0])
        errs.append(np.sqrt(np.mean((u - ue) ** 2)))
    assert errs[0] / errs[1] > 3.0, errs


def test_setup_cavity_3d_model():
    """models.cavity.setup_cavity_3d builds the reference
    cavity_flow_3d.c configuration (symmetry front plane) and steps."""
    from fluca_tpu.models.cavity import setup_cavity_3d

    ns = setup_cavity_3d(N=(8, 8, 4), Re=100.0, dt=0.05, max_steps=2)
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4
