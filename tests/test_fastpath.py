"""Fixed-budget fast solver path (production_fast): Richardson outer
+ damped-Jacobi momentum + MG-Richardson Schur.

These selections remove every Krylov bookkeeping pass (state ravels,
Gram-Schmidt, dots, per-iteration norms/projections) from the
production step; this file pins that they reproduce the reference-
semantics production preset's physics.

Also regression-pins the coarse-level pinv assembly: it must be built
on host in f64 from the banded tables. Probing the f32 device apply
leaves the constant-nullspace singular value at ~1e-7, pinv's rcond
keeps it, and the resulting O(1e7) entries silently weaken the V-cycle
(CG's per-iteration nullspace projection masked this in round 1).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d, tgv_errors
from fluca_tpu.ns.cnlinear import CNLinearConfig


def _tgv_err(cfg, N=16):
    ns = setup_taylor_green_2d(N=N, nsteps=N, t_final=0.5)
    ns.impl.cfg = cfg
    ns.solve()
    ve, pe = tgv_errors(ns)
    return ve / np.sqrt(2 * N * N), pe / np.sqrt(N * N)


def test_fast_path_matches_production_tgv():
    v0, p0 = _tgv_err(CNLinearConfig.production())
    v1, p1 = _tgv_err(CNLinearConfig.production_fast())
    # discretization error dominates; solver-path difference must be
    # far below it
    assert abs(v1 - v0) < 0.01 * v0, (v0, v1)
    assert abs(p1 - p0) < 0.01 * p0, (p0, p1)


@pytest.mark.parametrize(
    "field",
    ["outer_type", "mom_solver", "schur_solver"],
)
def test_each_fast_component_alone(field):
    v0, p0 = _tgv_err(CNLinearConfig.production())
    cfg = CNLinearConfig.production()
    setattr(
        cfg,
        field,
        {"outer_type": "richardson", "mom_solver": "jacobi",
         "schur_solver": "vcycle"}[field],
    )
    v1, p1 = _tgv_err(cfg)
    assert abs(v1 - v0) < 0.01 * v0, (field, v0, v1)
    assert abs(p1 - p0) < 0.01 * p0, (field, p0, p1)


def test_fast_path_divergence_free():
    ns = setup_taylor_green_2d(N=16, nsteps=8, t_final=0.25)
    ns.impl.cfg = CNLinearConfig.production_fast()
    ns.solve()
    div = ns.impl.ops.apply_D(ns.state["U"])
    assert float(np.max(np.abs(np.asarray(div)))) < 1e-4


def test_fast_path_3d_smoke():
    from fluca_tpu.models.cavity import setup_cavity_3d

    ns = setup_cavity_3d(N=(8, 8, 8), dt=0.02, max_steps=5)
    # reduced budgets: this is a does-the-3-D-path-work smoke, and
    # the full o3/m8/s6 unroll took ~11.5 min of XLA CPU compile
    # (measured 2026-08-20) for no extra coverage
    ns.impl.cfg = CNLinearConfig.production_fast(2, 4, 3)
    ns.solve()
    assert bool(ns.last_diag["converged"])
    assert np.all(np.isfinite(np.asarray(ns.state["v"][0])))


def test_high_cfl_richardson_fenced():
    """Regression for the r3 bench divergence (BENCH_r03.json
    "NS step 0 diverged: rnorm=inf"): on the PERTURBED impulsive
    channel start (the bench initial condition: laminar profile x
    (1 + 0.1 randn), CFL ~ 6) the damped-Jacobi momentum sweeps
    amplify — the rough convection field breaks A's diagonal
    dominance — and the plain Richardson outer compounds that
    geometrically. The GCR outer's residual-minimizing line search
    keeps the SAME preconditioner bounded (|r| non-increasing), which
    is why production_fast now defaults to it. Isolation runs
    (2026-08-20, CPU f32): perturb=0 converges at every size;
    perturb=0.1 diverges richardson at 32^3 and 64^3 alike."""
    from fluca_tpu.models.channel import setup_channel_3d

    def step0_rnorm(outer_type):
        ns = setup_channel_3d(
            N=(32, 16, 16), dt=8e-3, max_steps=5, perturb=0.1,
            dtype=jnp.float32,
        )
        ns.impl.cfg = CNLinearConfig.production_fast(
            3, 8, 6, outer_type=outer_type
        )
        ns.error_if_step_failed = False
        ns.step()
        return float(ns.last_diag["ksp_rnorm"])

    r_gcr = step0_rnorm("gcr")
    r_rich = step0_rnorm("richardson")
    assert np.isfinite(r_gcr), r_gcr
    # GCR cannot increase the residual past |b| ~ |v0| ~ 2e3 here
    assert r_gcr < 1e5, r_gcr
    # richardson blows past gcr by orders of magnitude (or to inf)
    assert (not np.isfinite(r_rich)) or r_rich > 100.0 * r_gcr, (
        r_gcr, r_rich,
    )


def test_production_budget_at_production_size():
    """Pin the fixed budgets (o3/m8/s6) at a production-like size:
    the presets were tuned at small grids, and VERDICT r2 flagged
    that nothing checked them where the Krylov contraction actually
    has to work. Cavity 128^2, 50 steps: the budgeted end state must
    track the converged (rtol 1e-5) solve to well below the velocity
    scale."""
    from fluca_tpu.models.cavity import setup_cavity_2d

    def run(cfg):
        ns = setup_cavity_2d(N=128, Re=100.0, dt=0.005, max_steps=60)
        ns.impl.cfg = cfg
        ns.advance(50)
        return [np.asarray(f) for f in ns.state["v"]] + [
            np.asarray(ns.state["p"])
        ]

    ref = run(CNLinearConfig())          # converged: rtol 1e-5
    got = run(CNLinearConfig.production())
    umax = max(np.max(np.abs(f)) for f in ref[:2])  # = lid speed 1
    for a, b in zip(got, ref):
        assert np.max(np.abs(a - b)) < 2e-4 * umax, np.max(
            np.abs(a - b)
        )


def test_coarse_pinv_is_exact():
    """Single-level MG: one V-cycle must solve to near machine
    precision for a zero-mean rhs (no nullspace projection needed)."""
    ns = setup_taylor_green_2d(N=16, nsteps=1, t_final=0.1)
    mg = ns.impl.mg
    assert len(mg.levels) == 1
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal((16, 16)), mg.levels[0].vol.dtype)
    b = b - jnp.mean(b)
    z = mg.precondition(b)
    r = b - mg.apply_op(z)
    rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-8, rel
