"""Fused 3-D momentum A-apply Pallas kernel vs the XLA banded path.

The kernel forms coefficients in-kernel from the 1-D bands +
face-factor fields (ops/pallas_stencil.build_momentum_apply_3d);
interpret mode runs it on CPU so the equivalence is checked in CI
without TPU hardware. Reference semantics: A = I + dt C - (mu dt /
2 rho) L (cnlinearcart3d.c momentum block).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns import tables as T_
from fluca_tpu.ns.bc import BCType, BoundaryCondition, zero_velocity_bc
from fluca_tpu.ns.operators import NSOperators
from fluca_tpu.ops.pallas_stencil import build_momentum_apply_3d

wall = zero_velocity_bc()
per = BoundaryCondition(BCType.PERIODIC)
sym = BoundaryCondition(BCType.SYMMETRY)
out = BoundaryCondition(
    BCType.PRESSURE_OUTLET, pressure=lambda t, xs: 0.0 * xs[0]
)


def _rand_state(rng, mesh, dtype):
    v = tuple(
        jnp.asarray(rng.standard_normal(mesh.cell_shape), dtype)
        for _ in range(3)
    )
    U0 = tuple(
        jnp.asarray(rng.standard_normal(mesh.face_shape(d)), dtype)
        for d in range(3)
    )
    v0f = tuple(
        tuple(
            jnp.asarray(rng.standard_normal(mesh.face_shape(d)), dtype)
            for _ in range(3)
        )
        for d in range(3)
    )
    return v, U0, v0f


@pytest.mark.parametrize(
    "periodic,bcs,stretch",
    [
        ((True, False, True), [per, per, wall, wall, per, per], True),
        ((False, False, False),
         [wall, out, wall, wall, sym, wall], False),
        ((False, False, False),
         [wall, wall, wall, wall, wall, wall], True),
    ],
    ids=["channel", "mixed", "cavity-stretched"],
)
def test_momentum3d_kernel_matches_xla(periodic, bcs, stretch):
    N = (16, 16, 128)
    mesh = CartMesh.create(N, periodic)
    if stretch:
        faces = []
        for n in N:
            f = np.linspace(0.0, 1.0, n + 1)
            faces.append(f + 0.2 * (f - f**2))
        mesh.set_coordinates(*faces)
    else:
        mesh.set_uniform_coordinates(0, 1, 0, 1, 0, 1)

    dtype = jnp.float64
    rho, mu, dt = 1.3, 0.02, 0.01
    ops = NSOperators(mesh, bcs, rho=rho, mu=mu, dt=dt, dtype=dtype)
    axbcs = T_.axis_bcs(mesh, bcs)
    prep, apply = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype, interpret=True
    )

    rng = np.random.default_rng(11)
    v, U0, v0f = _rand_state(rng, mesh, dtype)

    ref = ops.apply_A(v, U0, v0f)
    got = apply(v, prep(U0, v0f))
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(got[c]), np.asarray(ref[c]),
            rtol=0, atol=1e-12,
        )

    # split (per-component) mode — the VMEM fallback used at the
    # 256x256 cross-section of BASELINE #5 (VERDICT r3 item 2) —
    # must produce identical results
    prep_s, apply_s = build_momentum_apply_3d(
        mesh, axbcs, rho, mu, dt, dtype, interpret=True,
        force_split=True,
    )
    got_s = apply_s(v, prep_s(U0, v0f))
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(got_s[c]), np.asarray(ref[c]),
            rtol=0, atol=1e-12,
        )
