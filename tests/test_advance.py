"""Fused multi-step (lax.scan) fast path must match step-by-step."""

import numpy as np

from fluca_tpu.models.tgv import setup_taylor_green_2d


def test_advance_matches_stepwise():
    a = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    a.solve()

    b = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    b.advance(4)
    assert b.step_index == 4
    np.testing.assert_allclose(b.t, a.t)
    np.testing.assert_allclose(
        np.asarray(b.state["p"]), np.asarray(a.state["p"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(b.state["v"][0]), np.asarray(a.state["v"][0]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(b.state["phalf"]), np.asarray(a.state["phalf"]),
        atol=1e-12,
    )
