"""3-D sphere IBM smoke test (BASELINE config #4, reduced size)."""

import numpy as np

from fluca_tpu.ibm.markers import sphere_markers
from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.models.sphere import setup_sphere_3d


def test_sphere_markers_quadrature():
    m = CartMesh.create((16, 16, 16))
    m.set_uniform_coordinates(0, 1, 0, 1, 0, 1)
    mk = sphere_markers(m, (0.5, 0.5, 0.5), 0.2)
    X = np.asarray(mk.X)
    r = np.linalg.norm(X - 0.5, axis=1)
    np.testing.assert_allclose(r, 0.2, atol=1e-12)
    # total surface weight = 4 pi r^2 * h
    h = 1.0 / 16
    np.testing.assert_allclose(
        float(np.sum(np.asarray(mk.ds))), 4 * np.pi * 0.2**2 * h,
        rtol=1e-12,
    )


def test_sphere_flow_smoke():
    ns, ibm = setup_sphere_3d(
        N=(32, 16, 16), domain=(2.0, 1.0, 1.0),
        center=(0.5, 0.5, 0.5), diameter=0.25, Re=100.0,
        dt=0.02, max_steps=8,
    )
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))
    # wake deficit behind the sphere
    jc, kc = 8, 8
    i_wake = 12
    assert u[i_wake, jc, kc] < 0.85
    # surface velocity suppressed
    us = np.asarray(ibm.markers.interpolate(ns.state["v"][0]))
    assert np.mean(np.abs(us)) < 0.15
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4
