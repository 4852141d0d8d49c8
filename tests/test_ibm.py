"""IBM tests: delta kernel moment conditions, interp/spread
adjointness, direct-forcing boundary enforcement, cylinder wake
structure."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.ibm.delta import delta_peskin4, delta_roma3
from fluca_tpu.ibm.markers import MarkerSet, circle_markers
from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.models.cylinder import setup_cylinder_2d


@pytest.mark.parametrize(
    "fn,support", [(delta_roma3, 3), (delta_peskin4, 4)]
)
def test_delta_partition_of_unity(fn, support):
    """sum_i phi(r - i) = 1 for any shift r (zeroth moment)."""
    for shift in (0.0, 0.2, 0.49, 0.77):
        r = jnp.arange(-4, 5, dtype=jnp.float64) - shift
        s = float(jnp.sum(fn(r)))
        np.testing.assert_allclose(s, 1.0, atol=1e-12)


@pytest.mark.parametrize(
    "fn", [delta_roma3, delta_peskin4]
)
def test_delta_first_moment(fn):
    """sum_i (r - i) phi(r - i) = 0: linear fields interpolate
    exactly."""
    for shift in (0.0, 0.3, 0.5):
        r = jnp.arange(-4, 5, dtype=jnp.float64) - shift
        m1 = float(jnp.sum(r * fn(r)))
        np.testing.assert_allclose(m1, 0.0, atol=1e-12)


def _unit_mesh(N=32):
    m = CartMesh.create((N, N))
    m.set_uniform_coordinates(0.0, 1.0, 0.0, 1.0)
    return m


def test_interpolation_linear_exact():
    m = _unit_mesh()
    mk = circle_markers(m, (0.5, 0.5), 0.2)
    cx, cy = m.centers(0), m.centers(1)
    X, Y = np.meshgrid(cx, cy, indexing="ij")
    field = jnp.asarray(2.0 * X - 3.0 * Y + 1.0)
    vals = np.asarray(mk.interpolate(field))
    Xm = np.asarray(mk.X)
    exact = 2.0 * Xm[:, 0] - 3.0 * Xm[:, 1] + 1.0
    np.testing.assert_allclose(vals, exact, atol=1e-10)


def test_spread_interp_adjoint():
    """<E u, F ds> == <u, S F> vol (discrete adjointness)."""
    m = _unit_mesh()
    mk = circle_markers(m, (0.5, 0.5), 0.22)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(m.cell_shape))
    F = jnp.asarray(rng.standard_normal(mk.X.shape[0]))
    lhs = float(jnp.sum(mk.interpolate(u) * F * mk.ds))
    vol = float(m.widths(0)[0] * m.widths(1)[0])
    rhs = float(jnp.sum(u * mk.spread(F)) * vol)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_spread_total_force_conserved():
    """Integral of the spread force equals sum(F ds)."""
    m = _unit_mesh()
    mk = circle_markers(m, (0.5, 0.5), 0.2)
    F = jnp.ones(mk.X.shape[0])
    f = mk.spread(F)
    vol = float(m.widths(0)[0] * m.widths(1)[0])
    np.testing.assert_allclose(
        float(jnp.sum(f)) * vol, float(jnp.sum(mk.ds)), rtol=1e-10
    )


def test_cylinder_direct_forcing_enforces_no_slip():
    """After transient steps, the interpolated velocity at the
    cylinder surface must be near zero; a wake deficit must form and
    drag must be positive."""
    ns, ibm = setup_cylinder_2d(
        N=(96, 48), domain=(3.0, 1.5), center=(0.75, 0.75),
        diameter=0.25, Re=100.0, dt=0.01, max_steps=25,
    )
    ns.solve()
    mk = ibm.markers
    u_surf = np.asarray(mk.interpolate(ns.state["v"][0]))
    # free stream is 1.0; surface velocity should be strongly
    # suppressed by the forcing (explicit scheme leaves an O(CFL)
    # lag where the solve updates the field most)
    assert np.max(np.abs(u_surf)) < 0.2, np.max(np.abs(u_surf))
    assert np.mean(np.abs(u_surf)) < 0.08, np.mean(np.abs(u_surf))
    # wake deficit behind the cylinder
    u = np.asarray(ns.state["v"][0])
    i_wake = int(1.05 / 3.0 * 96)
    j_c = int(0.75 / 1.5 * 48)
    assert u[i_wake, j_c] < 0.6
    # inflow region undisturbed
    assert abs(u[3, j_c] - 1.0) < 0.2
    from fluca_tpu.models.cylinder import drag_lift_coefficients

    cd, cl = drag_lift_coefficients(ns, ibm, U_in=1.0, diameter=0.25)
    assert cd > 0.3, cd


def test_marker_retraction_geometry():
    """retract=r places markers at radius - r*h while the quadrature
    weights keep the nominal surface area (Breugem 2012 effective-
    radius correction)."""
    m = _unit_mesh()
    h = float(m.widths(0)[0])
    R = 0.2
    mk0 = circle_markers(m, (0.5, 0.5), R)
    mk1 = circle_markers(m, (0.5, 0.5), R, retract=0.5)
    r0 = np.linalg.norm(np.asarray(mk0.X) - 0.5, axis=1)
    r1 = np.linalg.norm(np.asarray(mk1.X) - 0.5, axis=1)
    np.testing.assert_allclose(r0, R, rtol=1e-6)
    np.testing.assert_allclose(r1, R - 0.5 * h, rtol=1e-6)
    # quadrature unchanged: ds still integrates the nominal surface
    np.testing.assert_allclose(
        float(jnp.sum(mk1.ds)), 2 * np.pi * R * h, rtol=1e-6
    )
    from fluca_tpu.ibm.markers import sphere_markers

    m3 = CartMesh.create((16, 16, 16))
    m3.set_uniform_coordinates(0, 1, 0, 1, 0, 1)
    h3 = float(m3.widths(0)[0])
    s1 = sphere_markers(m3, (0.5, 0.5, 0.5), R, kernel="roma3",
                        retract=0.4)
    rs = np.linalg.norm(np.asarray(s1.X) - 0.5, axis=1)
    np.testing.assert_allclose(rs, R - 0.4 * h3, rtol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(s1.ds)), 4 * np.pi * R**2 * h3, rtol=1e-6
    )
