"""Backward-facing step (models/bfs.py): separation physics smoke.

Full quantitative validation (x_r/S vs Armaly/Gartling) runs in
examples/backward_step.py; here a coarse short run must already show
the correct flow topology and a reattachment length in the literature
ballpark (measured 3.06 at 128x16 after t=4; steady literature value
2.8-3.1 at Re=100, ER=2).
"""

import numpy as np

from fluca_tpu.models.bfs import reattachment_length, setup_bfs_2d


def test_bfs_recirculation_and_reattachment():
    ns = setup_bfs_2d(N=(96, 16), L=8.0, Re=100.0, dt=0.02,
                      max_steps=160)
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))

    # recirculation bubble behind the step: negative u near the lower
    # wall just downstream, positive by the outlet
    near_wall = u[:, 0]
    assert near_wall[2:20].min() < -1e-3
    assert near_wall[-5:].min() > 0.0

    xr = reattachment_length(ns)
    assert 0.8 <= xr / 0.5 <= 4.5, xr

    # inlet mass flux is carried to the outlet (global conservation
    # through the PRESSURE_OUTLET boundary)
    Ux = np.asarray(ns.state["U"][0])
    wy = np.asarray(ns.mesh.widths(1))
    flux_in = float((Ux[0] * wy).sum())
    flux_out = float((Ux[-1] * wy).sum())
    assert abs(flux_out - flux_in) < 1e-6 * max(abs(flux_in), 1.0)


def test_bfs_inlet_profile_masked_below_step():
    """The inlet BC prescribes zero velocity over the step face
    (lower half) and the parabola above it."""
    ns = setup_bfs_2d(N=(32, 32), L=4.0, Re=100.0, dt=0.02,
                      max_steps=4)
    ns.solve()
    Ux = np.asarray(ns.state["U"][0])
    y = np.asarray(ns.mesh.centers(1))
    below = Ux[0][y < 0.5]
    above = Ux[0][y > 0.5]
    assert np.max(np.abs(below)) < 1e-12
    assert above.max() > 1.0  # parabola peak 1.5*u_mean
