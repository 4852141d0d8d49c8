"""TVD face interpolation tests (reference: fluca/tests/fd/ex7.c and
the tutorial self-checks of TVD boundedness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ops.fd import FDBC, FDBCType
from fluca_tpu.ops.limiters import limiter_registry
from fluca_tpu.ops.tvd import TVDOp


def mesh1d(N=16, periodic=True):
    m = CartMesh.create((N,), (periodic,))
    m.set_uniform_coordinates(0.0, 1.0)
    return m


def test_limiter_values():
    """Spot-check limiter formulas (secondordertvdlimiter.c)."""
    get = limiter_registry.get
    r = jnp.asarray(1.0)
    for name in limiter_registry.names():
        if name in ("upwind",):
            continue
        # all limiters pass through psi(1) = 1 (2nd-order consistency)
        np.testing.assert_allclose(float(get(name)(r)), 1.0, atol=1e-12)
    np.testing.assert_allclose(float(get("upwind")(r)), 0.0)
    np.testing.assert_allclose(float(get("superbee")(jnp.asarray(0.5))), 1.0)
    np.testing.assert_allclose(float(get("minmod")(jnp.asarray(2.0))), 1.0)
    np.testing.assert_allclose(float(get("sou")(jnp.asarray(2.0))), 2.0)
    np.testing.assert_allclose(
        float(get("quick")(jnp.asarray(2.0))), 1.25
    )
    # negative r -> 0 for TVD limiters
    for name in ("superbee", "minmod", "mc", "vanleer", "vanalbada",
                 "koren", "barthjesperson", "venkatakrishnan"):
        np.testing.assert_allclose(
            float(get(name)(jnp.asarray(-1.0))), 0.0, atol=1e-12
        )


def test_upwind_limiter_pure_upwind():
    m = mesh1d()
    op = TVDOp(m, 0, limiter="upwind")
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal(16))
    vel = jnp.ones(16)
    out = np.asarray(op.apply(phi, vel))
    np.testing.assert_allclose(out, np.roll(np.asarray(phi), 1))
    out = np.asarray(op.apply(phi, -vel))
    np.testing.assert_allclose(out, np.asarray(phi))


@pytest.mark.parametrize(
    "limiter", ["superbee", "minmod", "mc", "vanleer", "koren"]
)
def test_tvd_boundedness(limiter):
    """TVD property: limited face values stay within the bounds of the
    neighboring cell values (tutorial self-check analogue)."""
    m = mesh1d(32)
    op = TVDOp(m, 0, limiter=limiter)
    x = m.centers(0)
    # discontinuous profile (step + spike)
    phi = np.where(x < 0.5, 1.0, 0.0)
    phi[10] = 2.0
    phi_j = jnp.asarray(phi)
    for sgn in (1.0, -1.0):
        vel = jnp.full(32, sgn)
        out = np.asarray(op.apply(phi_j, vel))
        lo = np.minimum(phi, np.roll(phi, 1))
        hi = np.maximum(phi, np.roll(phi, 1))
        assert np.all(out >= lo - 1e-12)
        assert np.all(out <= hi + 1e-12)


def test_tvd_smooth_second_order():
    """On smooth data the limited interpolation is ~2nd-order (better
    than pure upwind)."""
    errs_tvd, errs_up = [], []
    for N in (32, 64):
        m = mesh1d(N)
        f = m.face_coords(0)
        x = m.centers(0)
        phi = jnp.asarray(np.sin(2 * np.pi * x) + 2.0)
        vel = jnp.ones(N)
        exact = np.sin(2 * np.pi * f) + 2.0
        out = np.asarray(TVDOp(m, 0, limiter="vanleer").apply(phi, vel))
        errs_tvd.append(np.max(np.abs(out - exact)))
        out = np.asarray(TVDOp(m, 0, limiter="upwind").apply(phi, vel))
        errs_up.append(np.max(np.abs(out - exact)))
    # upwind is 1st order; vanleer much better
    assert errs_tvd[1] < errs_up[1] / 3
    assert errs_tvd[0] / errs_tvd[1] > 2.5


def test_tvd_dirichlet_boundary_face():
    m = CartMesh.create((16,), (False,))
    m.set_uniform_coordinates(0.0, 1.0)
    bcs = [FDBC(FDBCType.DIRICHLET, 5.0), FDBC(FDBCType.DIRICHLET, 7.0)]
    op = TVDOp(m, 0, limiter="minmod", bcs=bcs)
    phi = jnp.asarray(np.linspace(5, 7, 16))
    vel = jnp.ones(17)
    out = np.asarray(op.apply(phi, vel))
    np.testing.assert_allclose(out[0], 5.0)
    np.testing.assert_allclose(out[-1], 7.0)


def test_tvd_2d_direction_y():
    m = CartMesh.create((8, 16), (True, True))
    m.set_uniform_coordinates(0, 1, 0, 1)
    op = TVDOp(m, 1, limiter="vanleer")
    rng = np.random.default_rng(1)
    phi = jnp.asarray(rng.standard_normal((8, 16)))
    vel = jnp.ones((8, 16))
    out = op.apply(phi, vel)
    assert out.shape == (8, 16)
    assert np.all(np.isfinite(np.asarray(out)))
