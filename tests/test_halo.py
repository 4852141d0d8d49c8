"""Explicit shard_map/ppermute halo exchange on the 8-device virtual
mesh, checked against single-device stencil application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns import tables as T
from fluca_tpu.ns.bc import BCType
from fluca_tpu.ops.banded import compose_axis_stencils
from fluca_tpu.parallel.halo import halo_exchange, stencil_apply_sharded
from fluca_tpu.parallel.mesh import make_device_grid, shard_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.mark.parametrize("periodic", [False, True])
def test_halo_exchange_fills_ghosts(periodic):
    grid = make_device_grid(2, jax.devices()[:8])
    N = 16
    x = jnp.arange(N * N, dtype=jnp.float32).reshape(N, N)
    xs = jax.device_put(x, grid.cell_sharding())
    with grid.mesh:
        ext = halo_exchange(grid, xs, (periodic, periodic), width=1)
    # per-shard extension: global result has per-shard ghosts, so the
    # reassembled array has shape (N + 2*gx_shards, N + 2*gy_shards)
    sx = grid.mesh.shape["gx"]
    sy = grid.mesh.shape["gy"]
    assert ext.shape == (N + 2 * sx, N + 2 * sy)
    arr = np.asarray(ext)
    npa = np.asarray(x)
    # check one interior shard boundary: shard row block size
    bs = N // sx
    # ghost row of shard 1 (left ghost) must equal last row of shard 0
    shard1_ghost = arr[bs + 2, 1 : 1 + N // sy]
    np.testing.assert_allclose(shard1_ghost, npa[bs - 1, : N // sy])


@pytest.mark.parametrize("periodic", [False, True])
def test_sharded_stencil_matches_global(periodic):
    """Explicit-halo banded apply == single-device composed D@Gst."""
    grid = make_device_grid(2, jax.devices()[:8])
    N = 32
    mesh = CartMesh.create((N, N), (periodic,) * 2)
    mesh.set_uniform_coordinates(0, 1, 0, 1)
    bc = BCType.PERIODIC if periodic else BCType.VELOCITY
    bands = []
    for d in range(2):
        gst, _, _ = T.gst_tables(mesh, d, T.AxisBC(bc, bc))
        div = T.div_tables(mesh, d)
        dgst = compose_axis_stencils(div, gst)
        bands.append(dgst.as_dict())

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, N)), jnp.float64)

    # global reference
    ref = None
    for d in range(2):
        from fluca_tpu.ops.banded import AxisStencil

        st = AxisStencil.from_dict(d, N, periodic, bands[d])
        t = st.apply(x)
        ref = t if ref is None else ref + t

    xs = jax.device_put(x, grid.cell_sharding())
    with grid.mesh:
        got = stencil_apply_sharded(
            grid, bands, xs, (periodic, periodic)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


@pytest.mark.parametrize("periodic", [False, True])
def test_overlapped_stencil_matches_global(periodic):
    """Overlap-scheduled apply == single-device composed D@Gst."""
    from fluca_tpu.parallel.halo import stencil_apply_sharded_overlapped

    grid = make_device_grid(2, jax.devices()[:8])
    N = 32
    mesh = CartMesh.create((N, N), (periodic,) * 2)
    mesh.set_uniform_coordinates(0, 1, 0, 1)
    bc = BCType.PERIODIC if periodic else BCType.VELOCITY
    bands = []
    for d in range(2):
        gst, _, _ = T.gst_tables(mesh, d, T.AxisBC(bc, bc))
        div = T.div_tables(mesh, d)
        dgst = compose_axis_stencils(div, gst)
        bands.append(dgst.as_dict())

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, N)), jnp.float64)

    ref = None
    for d in range(2):
        from fluca_tpu.ops.banded import AxisStencil

        st = AxisStencil.from_dict(d, N, periodic, bands[d])
        t = st.apply(x)
        ref = t if ref is None else ref + t

    xs = jax.device_put(x, grid.cell_sharding())
    with grid.mesh:
        got = stencil_apply_sharded_overlapped(
            grid, bands, xs, (periodic, periodic)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


def test_overlapped_stencil_3d_uneven_bands():
    """3-D, non-uniform grid, 2x2x2 device mesh."""
    from fluca_tpu.parallel.halo import stencil_apply_sharded_overlapped

    grid = make_device_grid(3, jax.devices()[:8])
    N = (8, 8, 16)
    mesh = CartMesh.create(N)
    f = [np.linspace(0, 1, n + 1) ** 1.2 for n in N]
    mesh.set_coordinates(*f)
    bands = []
    for d in range(3):
        gst, _, _ = T.gst_tables(
            mesh, d, T.AxisBC(BCType.VELOCITY, BCType.VELOCITY)
        )
        div = T.div_tables(mesh, d)
        bands.append(compose_axis_stencils(div, gst).as_dict())

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(N), jnp.float64)

    ref = None
    for d in range(3):
        from fluca_tpu.ops.banded import AxisStencil

        st = AxisStencil.from_dict(d, N[d], False, bands[d])
        t = st.apply(x)
        ref = t if ref is None else ref + t

    xs = jax.device_put(x, grid.cell_sharding())
    with grid.mesh:
        got = stencil_apply_sharded_overlapped(
            grid, bands, xs, (False,) * 3
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)
