"""FlucaFD-equivalent operator algebra tests — the analogue of the
reference's fd golden tests ex1-ex7 (fluca/tests/fd/), expressed as
tolerance-based checks against analytic stencils and fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ops.fd import (
    FDBC,
    FDBCType,
    ScaledFieldOp,
    derivative,
    fd_compose,
    fd_scale,
    fd_sum,
)

NONE = FDBC(FDBCType.NONE)


def mesh1d(N=8, periodic=False, lo=0.0, hi=1.0):
    m = CartMesh.create((N,), (periodic,))
    m.set_uniform_coordinates(lo, hi)
    return m


# -- ex1: derivative stencils ------------------------------------------
def test_first_derivative_central():
    m = mesh1d()
    op = derivative(m, 0, 1, 2)
    h = 1.0 / 8
    rows, const = op.row((4,))
    got = {c[0]: v for c, v in rows}
    np.testing.assert_allclose(got.get(3), -1 / (2 * h), rtol=1e-12)
    np.testing.assert_allclose(got.get(5), 1 / (2 * h), rtol=1e-12)
    np.testing.assert_allclose(got.get(4, 0.0), 0.0, atol=1e-9)
    assert const == 0.0


def test_second_derivative_central():
    m = mesh1d()
    op = derivative(m, 0, 2, 2)
    h = 1.0 / 8
    rows, _ = op.row((4,))
    expect = [((3,), 1 / h**2), ((4,), -2 / h**2), ((5,), 1 / h**2)]
    got = {c[0]: v for c, v in rows}
    for (c,), v in expect:
        np.testing.assert_allclose(got[c], v, rtol=1e-12)


def test_derivative_none_bc_one_sided():
    """NONE bc: boundary rows shift the window inward and stay exact
    for polynomials of degree < stencil size."""
    m = mesh1d()
    op = derivative(m, 0, 1, 2)  # 3-point stencil
    c = m.centers(0)
    f = c**2
    df = np.asarray(op.apply(jnp.asarray(f)))
    np.testing.assert_allclose(df, 2 * c, atol=1e-9)


def test_derivative_dirichlet_bc():
    """Dirichlet: boundary value folds into the constant term; exact
    for a quadratic satisfying the bc."""
    m = mesh1d()
    fb = lambda x: x**2 - x + 2.0
    bcs = [
        FDBC(FDBCType.DIRICHLET, fb(0.0)),
        FDBC(FDBCType.DIRICHLET, fb(1.0)),
    ]
    op = derivative(m, 0, 1, 2, bcs=bcs)
    c = m.centers(0)
    df = np.asarray(op.apply(jnp.asarray(fb(c))))
    np.testing.assert_allclose(df, 2 * c - 1, atol=1e-9)


def test_derivative_neumann_bc():
    """Neumann: prescribed boundary slope folds in; exact for a
    quadratic with matching slope."""
    m = mesh1d()
    fb = lambda x: x**2 + 3.0 * x
    dfb = lambda x: 2.0 * x + 3.0
    bcs = [
        FDBC(FDBCType.NEUMANN, dfb(0.0)),
        FDBC(FDBCType.NEUMANN, dfb(1.0)),
    ]
    op = derivative(m, 0, 2, 1, bcs=bcs)
    c = m.centers(0)
    d2 = np.asarray(op.apply(jnp.asarray(fb(c))))
    np.testing.assert_allclose(d2, 2.0, atol=1e-8)


def test_derivative_periodic_wraps():
    m = mesh1d(periodic=True)
    op = derivative(m, 0, 1, 2)
    rows, _ = op.row((0,))
    cols = [c[0] for c, _ in rows]
    assert 7 in cols  # wrapped neighbor


def test_derivative_cell_to_face():
    """Element -> face first derivative (2-pt compact)."""
    m = mesh1d()
    op = derivative(
        m, 0, 1, 1, in_stag=(False,), out_stag=(True,),
        bcs=[NONE, NONE],
    )
    c = m.centers(0)
    f = m.face_coords(0)
    df = np.asarray(op.apply(jnp.asarray(c**2)))
    # interior faces: exact for quadratics (2-pt central at face)
    np.testing.assert_allclose(df[1:-1], 2 * f[1:-1], atol=1e-9)


def test_derivative_face_to_cell():
    m = mesh1d()
    op = derivative(
        m, 0, 1, 1, in_stag=(True,), out_stag=(False,),
        bcs=[NONE, NONE],
    )
    f = m.face_coords(0)
    c = m.centers(0)
    df = np.asarray(op.apply(jnp.asarray(f**2)))
    np.testing.assert_allclose(df, 2 * c, atol=1e-9)


# -- ex2/ex3/ex4: sum, scale, composition -------------------------------
def test_sum_2d_laplacian():
    m = CartMesh.create((8, 8))
    m.set_uniform_coordinates(0, 1, 0, 1)
    dxx = derivative(m, 0, 2, 2)
    dyy = derivative(m, 1, 2, 2)
    lap = fd_sum(dxx, dyy)
    cx, cy = m.centers(0), m.centers(1)
    X, Y = np.meshgrid(cx, cy, indexing="ij")
    u = X**2 + Y**2
    out = np.asarray(lap.apply(jnp.asarray(u)))
    np.testing.assert_allclose(out, 4.0, atol=1e-8)


def test_scale_constant_and_field():
    m = mesh1d()
    op = derivative(m, 0, 1, 2)
    c = m.centers(0)
    s2 = fd_scale(op, 2.0)
    out = np.asarray(s2.apply(jnp.asarray(c**2)))
    np.testing.assert_allclose(out, 4 * c, atol=1e-9)
    sf = fd_scale(op, c)  # scale by field x
    out = np.asarray(sf.apply(jnp.asarray(c**2)))
    np.testing.assert_allclose(out, 2 * c**2, atol=1e-9)


def test_scaled_field_op_runtime():
    m = mesh1d()
    op = derivative(m, 0, 1, 2)
    sop = ScaledFieldOp(op)
    c = m.centers(0)
    sop.set_field(jnp.asarray(c))
    out = np.asarray(sop(jnp.asarray(c**2)))
    np.testing.assert_allclose(out, 2 * c**2, atol=1e-9)


def test_composition_dxx_equals_dx_of_dx():
    """d/dx(cell->face compact) ∘ d/dx(face->cell) = second
    derivative (the reference's compact nested form, ex4)."""
    m = mesh1d(16)
    inner = derivative(
        m, 0, 1, 1, in_stag=(False,), out_stag=(True,),
        bcs=[NONE, NONE],
    )
    outer = derivative(
        m, 0, 1, 1, in_stag=(True,), out_stag=(False,),
        bcs=[NONE, NONE],
    )
    d2 = fd_compose(outer, inner)
    c = m.centers(0)
    out = np.asarray(d2.apply(jnp.asarray(c**2)))
    # interior: classic [1,-2,1]/h^2, exact for quadratics
    np.testing.assert_allclose(out[1:-1], 2.0, atol=1e-8)


def test_composition_cross_derivative():
    m = CartMesh.create((8, 8))
    m.set_uniform_coordinates(0, 1, 0, 1)
    dx = derivative(m, 0, 1, 2)
    dy = derivative(m, 1, 1, 2)
    dxy = fd_compose(dx, dy)
    cx, cy = m.centers(0), m.centers(1)
    X, Y = np.meshgrid(cx, cy, indexing="ij")
    out = np.asarray(dxy.apply(jnp.asarray(X * Y)))
    np.testing.assert_allclose(out, 1.0, atol=1e-8)


def test_composition_const_flows_through():
    """Inner Dirichlet constant must pass through the outer operator
    (composition.c markers pass-through)."""
    m = mesh1d()
    fb = lambda x: x**2
    bcs = [
        FDBC(FDBCType.DIRICHLET, fb(0.0)),
        FDBC(FDBCType.DIRICHLET, fb(1.0)),
    ]
    inner = derivative(m, 0, 1, 2, bcs=bcs)  # df/dx with bc
    outer = derivative(m, 0, 1, 2)  # plain d/dx (NONE bc)
    d2 = fd_compose(outer, inner)
    c = m.centers(0)
    out = np.asarray(d2.apply(jnp.asarray(fb(c))))
    np.testing.assert_allclose(out, 2.0, atol=1e-7)


# -- ex6 analogue: solve the 2D Laplace equation with FD operators ----
def test_laplace_solve_via_fd_operator():
    """Reference ex6 solves Laplace with FlucaFDGetOperator + SNES and
    checks physics bounds; here: Dirichlet Laplace via the FD stencil
    + CG, compared to the analytic harmonic solution."""
    import jax.numpy as jnp

    from fluca_tpu.ops.fd import FDBC, FDBCType
    from fluca_tpu.solvers.krylov import bicgstab

    N = 24
    m = CartMesh.create((N, N))
    m.set_uniform_coordinates(0, 1, 0, 1)
    cx, cy = m.centers(0), m.centers(1)
    X, Y = np.meshgrid(cx, cy, indexing="ij")
    # harmonic: u = x^2 - y^2; boundary data folded via Dirichlet bcs
    # is position-dependent, so build bc as rows of the exact field:
    # use NONE bc + penalize? Simpler: solve with zero-bc shifted
    # problem: w = u - (x^2 - y^2) satisfies Laplace(w) = -Laplace(g)
    # with w=0 on the boundary.
    bcs = [FDBC(FDBCType.DIRICHLET, 0.0)] * 4
    lap = fd_sum(
        derivative(m, 0, 2, 2, bcs=bcs), derivative(m, 1, 2, 2, bcs=bcs)
    )
    # manufactured zero-boundary solution: u = sin(pi x) sin(pi y),
    # Laplacian(u) = -2 pi^2 u
    u_ex = np.sin(np.pi * X) * np.sin(np.pi * Y)
    rhs = -2.0 * np.pi**2 * u_ex

    def op(w):
        return lap.apply(w, include_const=False)

    res = bicgstab(op, jnp.asarray(rhs), rtol=1e-10, maxiter=2000)
    u = np.asarray(res.x)
    # physics self-checks (ex6 style): sign / maximum principle
    assert u.min() >= -1e-8
    assert u.max() <= 1.1
    # 2nd-order accuracy at N=24
    assert np.max(np.abs(u - u_ex)) < 5e-3


# -- ex5 analogue: matrix-free apply vs dense --------------------------
def test_apply_matches_dense():
    m = CartMesh.create((6, 5))
    m.set_uniform_coordinates(0, 1, 0, 2)
    op = fd_sum(derivative(m, 0, 2, 2), derivative(m, 1, 2, 2))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 5))
    A = op.to_dense()
    out = np.asarray(op.apply(jnp.asarray(x), include_const=False))
    np.testing.assert_allclose(out.ravel(), A @ x.ravel(), atol=1e-10)


# -- options-database construction (fdopts.c parity) -------------------
def test_fd_from_options():
    from fluca_tpu.ops.fd import fd_from_options, parse_loc
    from fluca_tpu.ops.tvd import TVDOp
    from fluca_tpu.utils.options import Options

    m = mesh1d()
    o = Options({
        "flucafd_type": "derivative",
        "flucafd_dir": "x",
        "flucafd_deriv_order": "2",
        "flucafd_accu_order": "2",
        "flucafd_left_bc_type": "dirichlet",
        "flucafd_left_bc_value": "1.0",
    })
    op = fd_from_options(m, o)
    c = m.centers(0)
    # quadratic with u(0)=1 (matching the bc) is reproduced exactly
    u = lambda x: x**2 + 1.0
    import jax.numpy as jnp

    d2 = np.asarray(op.apply(jnp.asarray(u(c))))
    np.testing.assert_allclose(d2[:4], 2.0, atol=1e-8)

    m2 = CartMesh.create((8, 8))
    m2.set_uniform_coordinates(0, 1, 0, 1)
    assert parse_loc("down_left", 2) == (True, True)
    assert parse_loc("element", 2) == (False, False)
    tvd = fd_from_options(
        m2, Options({"flucafd_type": "secondordertvd",
                     "flucafd_dir": "y",
                     "flucafd_limiter": "minmod"}))
    assert isinstance(tvd, TVDOp)


def test_fourth_order_accuracy():
    """accu_order=4 derivative converges at 4th order (the
    arbitrary-accuracy claim of the derivative builder)."""
    errs = []
    for N in (16, 32):
        m = mesh1d(N)
        op = derivative(m, 0, 1, 4)
        c = m.centers(0)
        f = np.sin(2 * np.pi * c)
        df = np.asarray(op.apply(jnp.asarray(f)))
        exact = 2 * np.pi * np.cos(2 * np.pi * c)
        # interior only (boundary one-sided rows are wider/one-sided)
        errs.append(np.max(np.abs(df - exact)[3:-3]))
    rate = errs[0] / errs[1]
    assert rate > 12.0, rate  # 4th order -> 16


def test_derivative_3d():
    m = CartMesh.create((6, 6, 6))
    m.set_uniform_coordinates(0, 1, 0, 1, 0, 1)
    dz = derivative(m, 2, 1, 2)
    cz = m.centers(2)
    Z = np.broadcast_to(cz[None, None, :], (6, 6, 6))
    out = np.asarray(dz.apply(jnp.asarray(Z**2)))
    np.testing.assert_allclose(out, 2 * Z, atol=1e-9)
