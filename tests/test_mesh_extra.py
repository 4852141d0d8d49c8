"""Mesh extras: refinement, options, boundary indices, volumes."""

import numpy as np
import pytest

from fluca_tpu.mesh.cart import BoundaryLoc, CartMesh
from fluca_tpu.utils.options import Options


def test_refine():
    m = CartMesh.create((8, 8), refine=2)
    assert m.N == (32, 32)


def test_from_options():
    o = Options({
        "cart_dim": "2", "cart_grid_x": "16", "cart_grid_y": "8",
        "cart_boundary_type_x": "periodic", "cart_refine": "1",
        "cart_xmax": "2.0",
    })
    m = CartMesh.from_options(o)
    assert m.N == (32, 16)
    assert m.periodic == (True, False)
    np.testing.assert_allclose(m.length(0), 2.0)


def test_boundary_index_mapping():
    m = CartMesh.create((4, 4, 4))
    assert m.boundary_index("left") == 0
    assert m.boundary_index("front") == 5
    assert BoundaryLoc.UP.axis == 1 and not BoundaryLoc.UP.is_low


def test_cell_volumes_nonuniform():
    m = CartMesh.create((3,))
    m.set_coordinates(np.array([0.0, 1.0, 3.0, 6.0]))
    np.testing.assert_allclose(m.cell_volumes(), [1.0, 2.0, 3.0])


def test_centers_ext_periodic_wrap():
    m = CartMesh.create((4,), (True,))
    m.set_uniform_coordinates(0.0, 1.0)
    ce = m.centers_ext(0, width=1)
    np.testing.assert_allclose(ce[0], m.centers(0)[-1] - 1.0)
    np.testing.assert_allclose(ce[-1], m.centers(0)[0] + 1.0)
