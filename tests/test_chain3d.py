"""Fused 3-D chain kernels (ops/pallas_chain3d) vs the banded
operator path, interpret mode on CPU (VERDICT r2 item 2). Covers the
channel BC mix (periodic/wall/periodic), the all-wall cavity, and a
pressure-outlet configuration, on a NON-uniform grid so every
position-dependent band row is exercised."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns import tables as T_
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ns.operators import NSOperators
from fluca_tpu.ops.pallas_chain3d import Chain3D


def make_ops(bc_kind):
    N = (16, 16, 16)
    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    out = BoundaryCondition(
        BCType.PRESSURE_OUTLET, pressure=lambda t, c: 0.0
    )
    sym = BoundaryCondition(BCType.SYMMETRY)
    if bc_kind == "channel":
        periodic = (True, False, True)
        bcs = [per, per, wall, wall, per, per]
    elif bc_kind == "cavity":
        periodic = (False, False, False)
        bcs = [wall] * 6
    else:  # outlet + symmetry mix
        periodic = (False, False, False)
        bcs = [wall, out, wall, wall, sym, sym]
    mesh = CartMesh.create(N, periodic)
    # non-uniform coordinates exercise position-dependent bands
    rng = np.random.default_rng(7)
    faces = []
    for d in range(3):
        f = np.cumsum(np.r_[0.0, 0.8 + 0.4 * rng.random(N[d])])
        faces.append(f)
    mesh.set_coordinates(*faces)
    ops = NSOperators(mesh, bcs, rho=1.3, mu=0.02, dt=0.01,
                      dtype=jnp.float64)
    axbcs = T_.axis_bcs(mesh, bcs)
    chain = Chain3D(mesh, axbcs, 1.3, 0.01, jnp.float64,
                    interpret=True)
    return ops, chain, mesh


def rand_state(mesh, seed=0):
    rng = np.random.default_rng(seed)
    v = tuple(
        jnp.asarray(rng.standard_normal(mesh.cell_shape))
        for _ in range(3)
    )
    U = tuple(
        jnp.asarray(rng.standard_normal(mesh.face_shape(d)))
        for d in range(3)
    )
    p = jnp.asarray(rng.standard_normal(mesh.cell_shape))
    return v, U, p


@pytest.mark.parametrize("bc_kind", ["channel", "cavity", "outlet"])
def test_chain_coupled_matches_banded(bc_kind):
    ops, chain, mesh = make_ops(bc_kind)
    v, U, p = rand_state(mesh)
    Av = tuple(
        jnp.asarray(
            np.random.default_rng(9).standard_normal(mesh.cell_shape)
        )
        for _ in range(3)
    )
    Gp = ops.apply_G(p)
    Tv = ops.apply_T(v)
    Rp = ops.apply_R(p)
    want_v = [np.asarray(Av[c] + Gp[c]) for c in range(3)]
    want_U = [np.asarray(U[d] - Tv[d] - Rp[d]) for d in range(3)]
    want_p = np.asarray(ops.apply_D(U))

    got_v, got_U, got_p = chain.coupled(Av, v, U, p)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(got_v[c]), want_v[c], rtol=1e-12, atol=1e-12
        )
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(got_U[d]), want_U[d], rtol=1e-12, atol=1e-12
        )
    np.testing.assert_allclose(
        np.asarray(got_p), want_p, rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("bc_kind", ["channel", "cavity", "outlet"])
def test_chain_abf_pre_post_match_banded(bc_kind):
    ops, chain, mesh = make_ops(bc_kind)
    v, rU, rp = rand_state(mesh, seed=3)

    Tv = ops.apply_T(v)
    want_Ustar = [np.asarray(rU[d] + Tv[d]) for d in range(3)]
    want_rp = np.asarray(
        rp - ops.apply_D(tuple(rU[d] + Tv[d] for d in range(3)))
    )
    got_Ustar, got_rp = chain.abf_pre(v, rU, rp)
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(got_Ustar[d]), want_Ustar[d],
            rtol=1e-12, atol=1e-12,
        )
    np.testing.assert_allclose(
        np.asarray(got_rp), want_rp, rtol=1e-12, atol=1e-12
    )

    vs, Ust, p = rand_state(mesh, seed=4)
    Gp = ops.apply_G(p)
    Gstp = ops.apply_Gst(p)
    want_v = [np.asarray(vs[c] - Gp[c]) for c in range(3)]
    want_U = [np.asarray(Ust[d] - Gstp[d]) for d in range(3)]
    got_v, got_U = chain.abf_post(vs, Ust, p)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(got_v[c]), want_v[c], rtol=1e-12, atol=1e-12
        )
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(got_U[d]), want_U[d], rtol=1e-12, atol=1e-12
        )


def test_chain_full_step_matches():
    """A full CNLinear step with the fused chain stages active
    (interpret mode) must match the banded-path step exactly."""
    import jax

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    def run(use_chain):
        ns = setup_channel_3d(N=(8, 8, 8), dt=2e-3, max_steps=10,
                              dtype=jnp.float64)
        ns.impl.cfg = CNLinearConfig.production()
        if use_chain:
            axbcs = T_.axis_bcs(ns.mesh, ns.impl.ops.bcs)
            ns.impl.ops._chain3d = Chain3D(
                ns.mesh, axbcs, ns.rho, ns.impl.dt, ns.dtype,
                interpret=True,
            )
        ns.advance(3)
        return ns.state

    a = run(False)
    b = run(True)
    # different summation order inside the kernel: roundoff-level
    # differences only
    for k in ("p", "phalf"):
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), rtol=1e-10, atol=1e-10
        )
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(b["v"][c]), np.asarray(a["v"][c]),
            rtol=1e-10, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(b["U"][c]), np.asarray(a["U"][c]),
            rtol=1e-10, atol=1e-10,
        )
