"""ABF Atilde approximation variants (reference
-pc_abf_schur_ainv_type / -pc_abf_upper_ainv_type, abfpc.c:240-252):
all variants must converge to the same solution since the
preconditioner only changes the iteration, not the system."""

import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d
from fluca_tpu.ns.cnlinear import CNLinearConfig


def run_with(schur_ainv, upper_ainv):
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    ns.impl.cfg = CNLinearConfig(
        schur_ainv=schur_ainv, upper_ainv=upper_ainv
    )
    ns.solve()
    assert bool(ns.last_diag["converged"]), (schur_ainv, upper_ainv)
    return np.asarray(ns.state["v"][0]), int(ns.last_diag["ksp_iters"])


@pytest.fixture(scope="module")
def u_id():
    u, _ = run_with("id", "id")
    return u


@pytest.mark.parametrize(
    "schur,upper",
    [("diag", "id"), ("rowsum", "id"), ("diag", "diag"),
     ("rowsum", "rowsum")],
)
def test_variants_match_id(schur, upper, u_id):
    u_var, iters = run_with(schur, upper)
    np.testing.assert_allclose(u_var, u_id, atol=2e-4)
    assert iters < 60
