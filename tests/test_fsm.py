"""Reduced-work solve modes.

- "fsm": the classical single-pass fractional-step method (the ABF
  Atilde=I limit, THEORY_GUIDE.md:318-349). With the linearized-CN
  momentum operator its splitting error is O(dt) globally — kept for
  completeness/diagnostics.
- converged_skip + maxiter=3: fixed-budget coupled iteration. Three
  ABF-preconditioned FGMRES iterations reproduce the fully-converged
  (rtol 1e-5) TGV accuracy at every tested resolution — the
  production fast path (3-8x fewer iterations).
"""

import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d, tgv_errors
from fluca_tpu.ns.cnlinear import CNLinearConfig


def run_tgv(N, nsteps, cfg):
    ns = setup_taylor_green_2d(N=N, nsteps=nsteps, t_final=0.5)
    ns.impl.cfg = cfg
    ns.solve()
    ve, pe = tgv_errors(ns)
    return ve / np.sqrt(2 * N * N), pe / np.sqrt(N * N)


def test_capped3_matches_full_accuracy():
    cfg = CNLinearConfig(
        rtol=1e-30, maxiter=3, restart=3, converged_skip=True
    )
    full = CNLinearConfig()
    for N, nsteps in ((8, 8), (16, 16)):
        v_fast, _ = run_tgv(N, nsteps, cfg)
        v_full, _ = run_tgv(N, nsteps, full)
        assert v_fast < 1.05 * v_full + 1e-12, (N, v_fast, v_full)


def test_capped3_second_order():
    cfg = CNLinearConfig(
        rtol=1e-30, maxiter=3, restart=3, converged_skip=True
    )
    e8, _ = run_tgv(8, 8, cfg)
    e16, _ = run_tgv(16, 16, cfg)
    assert e8 / e16 > 3.0


def test_fsm_single_pass_runs_divergence_free():
    """Single-pass FSM: stable, divergence-free, in the right
    ballpark (its splitting error is documented above)."""
    ns = setup_taylor_green_2d(N=16, nsteps=8, t_final=0.25)
    ns.impl.cfg = CNLinearConfig(solve_type="fsm")
    ns.solve()
    ve, _ = tgv_errors(ns)
    assert np.isfinite(ve) and ve / np.sqrt(2 * 16 * 16) < 0.05
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4


def test_production_preset_accuracy():
    """CNLinearConfig.production(): fixed budgets, full accuracy."""
    cfg = CNLinearConfig.production()
    e8, _ = run_tgv(8, 8, cfg)
    e16, _ = run_tgv(16, 16, cfg)
    assert e8 / e16 > 3.5
    full8, _ = run_tgv(8, 8, CNLinearConfig())
    assert abs(e8 - full8) < 0.02 * full8
