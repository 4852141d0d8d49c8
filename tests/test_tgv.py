"""Taylor-Green vortex: the end-to-end NS correctness oracle
(reference: fluca/tests/taylor_green_vortex/taylor_green_vortex.c).
Verifies 2nd-order space+time convergence of the CNLinear scheme for
both velocity-BC and fully periodic modes."""

import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d, tgv_errors


@pytest.mark.parametrize("periodic", [False, True])
def test_tgv_second_order_convergence(periodic):
    rms = []
    for N, nsteps in ((8, 8), (16, 16)):
        ns = setup_taylor_green_2d(
            N=N, nsteps=nsteps, t_final=0.5, periodic=periodic
        )
        ns.solve()
        ve, pe = tgv_errors(ns)
        rms.append((ve / np.sqrt(2 * N * N), pe / np.sqrt(N * N)))
    rate_v = rms[0][0] / rms[1][0]
    rate_p = rms[0][1] / rms[1][1]
    # 2nd order -> factor 4; allow slack on coarse grids
    assert rate_v > 3.0, f"velocity convergence rate {rate_v:.2f} < 3"
    assert rate_p > 3.0, f"pressure convergence rate {rate_p:.2f} < 3"


def test_tgv_solver_converges_each_step():
    ns = setup_taylor_green_2d(N=16, nsteps=4, t_final=0.25)
    ns.solve()
    assert ns.last_diag is not None
    assert bool(ns.last_diag["converged"])
    assert float(ns.last_diag["ksp_rnorm"]) < 1e-3
    assert ns.step_index == 4


def test_tgv_divergence_free():
    """After a step, the face-normal velocity must satisfy the
    discrete continuity equation D U = 0 to solver tolerance
    (THEORY_GUIDE eq. 10)."""
    ns = setup_taylor_green_2d(N=16, nsteps=4, t_final=0.25)
    ns.solve()
    div = ns.impl.ops.apply_D(ns.state["U"])
    assert float(np.max(np.abs(np.asarray(div)))) < 1e-4
