"""Verify the per-axis NS stencil tables against analytic fields.

Strategy (mirrors the reference's FD golden tests + analytic
verification, SURVEY.md §4): each table must reproduce derivatives /
interpolations exactly for polynomials within the scheme's order, on
uniform and stretched grids, for every BC type."""

import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns import tables as T
from fluca_tpu.ns.bc import BCType


def mesh1d(N=8, periodic=False, stretch=False):
    m = CartMesh.create((N,), (periodic,))
    if stretch:
        # smooth non-uniform spacing
        s = np.linspace(0.0, 1.0, N + 1)
        f = s + 0.05 * np.sin(2 * np.pi * s)
        m.set_coordinates(f)
    else:
        m.set_uniform_coordinates(0.0, 1.0)
    return m


VEL = BCType.VELOCITY
OUT = BCType.PRESSURE_OUTLET
PER = BCType.PERIODIC
SYM = BCType.SYMMETRY


# ----------------------------------------------------------------------
# cell-gradient G
# ----------------------------------------------------------------------
@pytest.mark.parametrize("stretch", [False, True])
@pytest.mark.parametrize("bc", [VEL, SYM])
def test_grad_cell_linear_exact(stretch, bc):
    """Central + one-sided rows are exact for linear p. For SYMMETRY
    the scheme assumes dp/dn = 0 at the wall, so test a constant."""
    m = mesh1d(stretch=stretch)
    st, lo, hi = T.grad_cell_tables(m, 0, T.AxisBC(bc, bc))
    c = m.centers(0)
    A = st.to_dense(m.N[0])
    if bc == SYM:
        np.testing.assert_allclose(A @ np.ones_like(c), 0.0, atol=1e-12)
    else:
        p = 2.0 * c + 1.0
        np.testing.assert_allclose(A @ p, 2.0, atol=1e-9)


def test_grad_cell_quadratic_interior():
    m = mesh1d()
    st, _, _ = T.grad_cell_tables(m, 0, T.AxisBC(VEL, VEL))
    c = m.centers(0)
    A = st.to_dense(m.N[0])
    g = A @ (c**2)
    np.testing.assert_allclose(g, 2.0 * c, atol=1e-9)  # 3pt one-sided exact


def test_grad_cell_periodic():
    m = mesh1d(periodic=True)
    st, _, _ = T.grad_cell_tables(m, 0, T.AxisBC(PER, PER))
    c = m.centers(0)
    p = np.sin(2 * np.pi * c)
    A = st.to_dense(m.N[0])
    # rows sum to zero (constants in nullspace) and wrap correctly
    np.testing.assert_allclose(A.sum(1), 0.0, atol=1e-12)
    g = A @ p
    # central diff of sin(kx): sin(k*h)/h vs k -> known modified
    # wavenumber; compare against that exactly
    h = 1.0 / m.N[0]
    exact = np.sin(2 * np.pi * h) / h * np.cos(2 * np.pi * c)
    np.testing.assert_allclose(g, exact, atol=1e-9)


def test_grad_cell_outlet_dirichlet():
    """With the Dirichlet row + bc coefficient, gradient of a linear
    pressure including boundary value must be exact."""
    m = mesh1d()
    st, lo, hi = T.grad_cell_tables(m, 0, T.AxisBC(OUT, OUT))
    c, f = m.centers(0), m.faces[0]
    p = lambda x: 3.0 * x + 0.5
    A = st.to_dense(m.N[0])
    g = A @ p(c)
    g[0] += lo * p(f[0])
    g[-1] += hi * p(f[-1])
    np.testing.assert_allclose(g, 3.0, atol=1e-9)


# ----------------------------------------------------------------------
# Laplacian L
# ----------------------------------------------------------------------
def test_lap_velocity_dirichlet_quadratic_exact():
    m = mesh1d()
    st, blo, bhi = T.lap_tables(m, 0, T.AxisBC(VEL, VEL), comp=0)
    c, f = m.centers(0), m.faces[0]
    u = lambda x: x**2 - 0.3 * x + 1.0
    A = st.to_dense(m.N[0])
    Lu = A @ u(c)
    Lu[0] += blo * u(f[0])
    Lu[-1] += bhi * u(f[-1])
    # uniform grid: central scheme + boundary rows exact for quadratics
    np.testing.assert_allclose(Lu, 2.0, atol=1e-9)


def test_lap_stretched_truncation_converges():
    """The nested-difference Laplacian (THEORY_GUIDE.md:100-112) is
    not quadratic-exact on non-uniform grids; verify its truncation
    error vanishes at ~2nd order on a smoothly stretched grid."""
    errs = []
    for N in (16, 32, 64):
        m = mesh1d(N=N, stretch=True)
        st, blo, bhi = T.lap_tables(m, 0, T.AxisBC(VEL, VEL), comp=0)
        c, f = m.centers(0), m.faces[0]
        u = lambda x: x**2
        Lu = st.to_dense(N) @ u(c)
        Lu[0] += blo * u(f[0])
        Lu[-1] += bhi * u(f[-1])
        errs.append(np.max(np.abs(Lu - 2.0)))
    assert errs[1] < 0.35 * errs[0]
    assert errs[2] < 0.35 * errs[1]


def test_lap_neumann_linear():
    """Zero-gradient (outlet) walls: Laplacian of a constant is 0, and
    the wall rows treat du/dn=0 consistently."""
    m = mesh1d()
    st, blo, bhi = T.lap_tables(m, 0, T.AxisBC(OUT, OUT), comp=0)
    A = st.to_dense(m.N[0])
    np.testing.assert_allclose(A @ np.ones(m.N[0]), 0.0, atol=1e-12)
    assert blo == 0.0 and bhi == 0.0


def test_lap_periodic_rowsum():
    m = mesh1d(periodic=True)
    st, _, _ = T.lap_tables(m, 0, T.AxisBC(PER, PER), comp=0)
    A = st.to_dense(m.N[0])
    np.testing.assert_allclose(A.sum(1), 0.0, atol=1e-10)
    # uniform grid: classic [1,-2,1]/h^2
    h = 1.0 / m.N[0]
    np.testing.assert_allclose(A[3, 2:5], [1, -2, 1] / np.array(h**2))


def test_lap_symmetry_components():
    """Normal component: Dirichlet-0 row; tangential: Neumann row."""
    m = mesh1d()
    stn, blo, _ = T.lap_tables(m, 0, T.AxisBC(SYM, SYM), comp=0)
    stt, _, _ = T.lap_tables(m, 0, T.AxisBC(SYM, SYM), comp=1)
    An, At = stn.to_dense(m.N[0]), stt.to_dense(m.N[0])
    # tangential: constant in nullspace
    np.testing.assert_allclose(At @ np.ones(m.N[0]), 0.0, atol=1e-12)
    # normal: boundary row must NOT annihilate constants (wall value 0)
    assert abs((An @ np.ones(m.N[0]))[0]) > 1.0
    assert blo == 0.0  # symmetry contributes no bc vector


# ----------------------------------------------------------------------
# interpolation (B/T rows)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("stretch", [False, True])
def test_interp_linear_exact(stretch):
    m = mesh1d(stretch=stretch)
    st, lo_ins, hi_ins = T.interp_tables(m, 0, T.AxisBC(OUT, OUT), comp=0)
    c, f = m.centers(0), m.faces[0]
    u = lambda x: 4.0 * x - 1.0
    A = st.to_dense(m.N[0])
    uf = A @ u(c)
    # interior faces: exact for linear; boundary faces use
    # zero-gradient extrapolation (exact only for constants) -> check
    # interior exactly and boundary approximately
    np.testing.assert_allclose(uf[1:-1], u(f[1:-1]), atol=1e-9)
    assert not lo_ins and not hi_ins


def test_interp_velocity_insert():
    m = mesh1d()
    st, lo_ins, hi_ins = T.interp_tables(m, 0, T.AxisBC(VEL, VEL), comp=0)
    assert lo_ins and hi_ins
    A = st.to_dense(m.N[0])
    np.testing.assert_allclose(A[0], 0.0)
    np.testing.assert_allclose(A[-1], 0.0)


def test_interp_periodic():
    m = mesh1d(periodic=True)
    st, _, _ = T.interp_tables(m, 0, T.AxisBC(PER, PER), comp=0)
    A = st.to_dense(m.N[0])
    assert A.shape == (m.N[0], m.N[0])
    # face 0 between cell N-1 and 0 with half weights (uniform)
    np.testing.assert_allclose(A[0, [-1, 0]], [0.5, 0.5])


# ----------------------------------------------------------------------
# staggered gradient Gst and divergence D
# ----------------------------------------------------------------------
def test_gst_linear_interior_and_outlet():
    m = mesh1d()
    st, lo, hi = T.gst_tables(m, 0, T.AxisBC(OUT, OUT))
    c, f = m.centers(0), m.faces[0]
    p = lambda x: -2.0 * x + 3.0
    A = st.to_dense(m.N[0])
    g = A @ p(c)
    g[0] += lo * p(f[0])
    g[-1] += hi * p(f[-1])
    np.testing.assert_allclose(g, -2.0, atol=1e-9)


def test_gst_velocity_walls_zero_rows():
    m = mesh1d()
    st, lo, hi = T.gst_tables(m, 0, T.AxisBC(VEL, VEL))
    A = st.to_dense(m.N[0])
    np.testing.assert_allclose(A[0], 0.0)
    np.testing.assert_allclose(A[-1], 0.0)
    assert lo == 0.0 and hi == 0.0


def test_div_telescopes():
    m = mesh1d(stretch=True)
    st = T.div_tables(m, 0)
    f = m.faces[0]
    U = np.sin(f)  # arbitrary face field
    A = st.to_dense(m.N[0] + 1)
    d = A @ U
    h = m.widths(0)
    np.testing.assert_allclose(d, np.diff(U) / h, atol=1e-12)


def test_div_periodic():
    m = mesh1d(periodic=True)
    st = T.div_tables(m, 0)
    A = st.to_dense(m.N[0])
    # divergence of constant face field is zero (wraps)
    np.testing.assert_allclose(A @ np.ones(m.N[0]), 0.0, atol=1e-12)


# ----------------------------------------------------------------------
# convection weights
# ----------------------------------------------------------------------
def test_conv_uniform_interior():
    """On a uniform grid with unit face factors the flux difference of
    a linear field must equal d(u*1)/dx / 2 twice = du/dx (the two
    0.5-weighted linearization halves are built separately; one
    variant alone gives du/dx / 2... verify against brute force)."""
    m = mesh1d()
    N = m.N[0]
    wl, wr = T.conv_tables(m, 0, T.AxisBC(PER, PER), col_is_normal=True)
    c = m.centers(0)
    u = 3.0 * c + 1.0
    out = np.zeros(N)
    for off in (-1, 0, 1):
        out += wl[off] * np.roll(u, -off) + wr[off] * np.roll(u, -off)
    # with F=1 at every face: sum = 0.5 * d(u)/dx (interior rows; the
    # wrap rows see the discontinuity of the non-periodic test field)
    np.testing.assert_allclose(out[1:-1], 0.5 * 3.0, atol=1e-9)


def test_conv_velocity_wall_drops_boundary_flux():
    m = mesh1d()
    wl, wr = T.conv_tables(m, 0, T.AxisBC(VEL, VEL), col_is_normal=True)
    for off in (-1, 0, 1):
        assert wl[off][0] == 0.0  # left face of cell 0 dropped
        assert wr[off][-1] == 0.0  # right face of cell N-1 dropped


def test_conv_outlet_extrapolation_constant_exact():
    """Zero-gradient extrapolation reproduces a constant exactly."""
    m = mesh1d()
    N = m.N[0]
    wl, wr = T.conv_tables(m, 0, T.AxisBC(OUT, OUT), col_is_normal=False)
    u = np.ones(N)
    out = np.zeros(N)
    for off in (-1, 0, 1):
        sh = np.zeros(N)
        src = np.arange(N) + off
        valid = (src >= 0) & (src < N)
        sh[valid] = u[src[valid]]
        out += (wl[off] + wr[off]) * sh
    # flux difference of constant*1 is zero everywhere
    np.testing.assert_allclose(out, 0.0, atol=1e-12)


def test_apply_R_composed_matches_chain():
    """The per-axis composed R bands (T_d ∘ G_d - Gst_d) must equal
    the unfused T(G p) - Gst p chain exactly, for every BC type and
    on a stretched grid."""
    import jax.numpy as jnp

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import (
        BCType,
        BoundaryCondition,
        zero_velocity_bc,
    )
    from fluca_tpu.ns.operators import NSOperators

    rng = np.random.default_rng(7)
    wall = zero_velocity_bc()
    out = BoundaryCondition(
        BCType.PRESSURE_OUTLET, pressure=lambda t, xs: 0.0 * xs[0]
    )
    sym = BoundaryCondition(BCType.SYMMETRY)
    per = BoundaryCondition(BCType.PERIODIC)

    configs = [
        ((12, 10), (False, False), [wall, out, sym, wall]),
        ((8, 12), (True, False), [per, per, wall, out]),
    ]
    for N, periodic, bcs in configs:
        mesh = CartMesh.create(N, periodic)
        # stretched coordinates exercise the non-uniform tables
        faces = []
        for n in N:
            f = np.linspace(0.0, 1.0, n + 1)
            faces.append(f + 0.08 * np.sin(2.3 * np.pi * f) * (f[1]))
        mesh.set_coordinates(*faces)
        ops = NSOperators(mesh, bcs, rho=2.0, mu=0.3, dt=0.05,
                          dtype=jnp.float64)
        p = jnp.asarray(rng.standard_normal(N))

        Rp = ops.apply_R(p)
        Gp = ops.apply_G(p)
        TGp = ops.apply_T(Gp)
        Gstp = ops.apply_Gst(p)
        for d in range(mesh.dim):
            np.testing.assert_allclose(
                np.asarray(Rp[d]),
                np.asarray(TGp[d] - Gstp[d]),
                rtol=0, atol=1e-13,
            )
