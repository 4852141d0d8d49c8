"""Fused momentum A-apply (interpret mode) vs the reference coefficient
path and the original banded path."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d
from fluca_tpu.ops.pallas_stencil import build_momentum_apply_2d


@pytest.mark.parametrize("periodic", [False, True])
def test_momentum_kernel_matches_banded(periodic):
    ns = setup_taylor_green_2d(N=16, nsteps=1, t_final=0.1,
                               periodic=periodic)
    ops = ns.impl.ops
    state = ns.state
    rng = np.random.default_rng(0)
    # random face/interp fields to exercise convection coefficients
    U0 = tuple(
        jnp.asarray(rng.standard_normal(ops.mesh.face_shape(d)))
        for d in range(2)
    )
    Bv0 = ops.apply_B(state["v"])
    v0f = tuple(
        tuple(
            Bv0[d][c]
            + jnp.asarray(
                rng.standard_normal(ops.mesh.face_shape(d))
            )
            for c in range(2)
        )
        for d in range(2)
    )
    v = tuple(
        jnp.asarray(rng.standard_normal(ops.mesh.cell_shape))
        for _ in range(2)
    )

    ref = ops.apply_A(v, U0, v0f)
    coeffs = ops.build_momentum_coeffs(U0, v0f)
    mid = ops.apply_A_coeffs(v, coeffs)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(mid[c]), np.asarray(ref[c]), atol=1e-10
        )

    # interpret-mode fused kernel + fixups
    ops._mom_kernel = build_momentum_apply_2d(
        ops.mesh.N[0], ops.mesh.N[1],
        ops.mesh.periodic[0], ops.mesh.periodic[1],
        jnp.float64, interpret=True, tile_rows=8,
    )
    stacked = ops.build_momentum_coeffs_stacked(U0, v0f)
    got = ops.apply_A_stacked(v, stacked)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(got[c]), np.asarray(ref[c]), atol=1e-10
        )
