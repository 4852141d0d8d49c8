"""Poiseuille channel: the PRESSURE_OUTLET + inflow BC correctness
oracle (analytic steady state)."""

import numpy as np

from fluca_tpu.models.channel import poiseuille_exact, setup_channel_2d


def test_poiseuille_steady_state_preserved():
    """Initialized with the exact solution, the flow must stay on it
    (residual of the full discrete system near machine level)."""
    mu, U_max, L, H = 0.05, 1.0, 2.0, 1.0
    ns = setup_channel_2d(
        N=(32, 16), L=L, H=H, U_max=U_max, mu=mu, dt=0.05, max_steps=10
    )
    ns.solve()
    u_ex, p_ex = poiseuille_exact(mu, U_max, L, H)
    cx, cy = ns.mesh.centers(0), ns.mesh.centers(1)
    Xc, Yc = np.meshgrid(cx, cy, indexing="ij")
    u = np.asarray(ns.state["v"][0])
    v = np.asarray(ns.state["v"][1])
    p = np.asarray(ns.state["p"])
    assert np.max(np.abs(u - u_ex(Yc))) < 5e-3
    assert np.max(np.abs(v)) < 5e-3
    # pressure gradient maintained (compare up to its range)
    dp = p - p_ex(Xc)
    assert np.max(np.abs(dp - dp.mean())) < 5e-2 * np.max(p_ex(Xc))


def test_poiseuille_develops_from_uniform():
    """Started from rest, the inflow/outlet system must evolve toward
    the parabolic profile."""
    mu, U_max, L, H = 0.05, 1.0, 2.0, 1.0
    ns = setup_channel_2d(
        N=(32, 16), L=L, H=H, U_max=U_max, mu=mu, dt=0.05,
        max_steps=60, exact_init=False,
    )
    ns.solve()
    u_ex, _ = poiseuille_exact(mu, U_max, L, H)
    cy = ns.mesh.centers(1)
    u = np.asarray(ns.state["v"][0])
    mid = u.shape[0] // 2
    err = np.max(np.abs(u[mid] - u_ex(cy))) / U_max
    assert err < 0.15, err


def test_channel3d_driven_smoke():
    """3-D body-force-driven channel: runs, stays finite, maintains
    mean flow, divergence-free."""
    from fluca_tpu.models.channel import setup_channel_3d
    import numpy as np

    ns = setup_channel_3d(N=(16, 16, 8), dt=5e-3, max_steps=4,
                          perturb=0.05)
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))
    assert u.mean() > 1.0  # mean flow persists under forcing
    # rtol-limited: the perturbed IC makes ||b|| large, so the
    # continuity residual scales accordingly
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-2


def test_time_dependent_inflow():
    """Pulsating inflow: the traced-time BC path end-to-end (bc
    callbacks receive the traced t inside jit)."""
    import jax.numpy as jnp

    from fluca_tpu.mesh.cart import CartMesh
    from fluca_tpu.ns.bc import BCType, BoundaryCondition, \
        zero_velocity_bc
    from fluca_tpu.ns.ns import NS

    mesh = CartMesh.create((24, 12))
    mesh.set_uniform_coordinates(0, 2, 0, 1)
    inflow = BoundaryCondition(
        BCType.VELOCITY,
        velocity=lambda t, xs: (
            (1.0 + 0.5 * jnp.sin(4 * jnp.pi * t)) * (1.0 + 0.0 * xs[1]),
            0.0 * xs[1],
        ),
    )
    outflow = BoundaryCondition(
        BCType.PRESSURE_OUTLET, pressure=lambda t, xs: 0.0 * xs[1]
    )
    wall = zero_velocity_bc()
    ns = NS(mesh, rho=1.0, mu=0.05, dt=0.025, max_steps=30,
            bcs=[inflow, outflow, wall, wall])
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))
    # the inflow column tracks the pulsation: at t=0.75, sin(3pi)=0,
    # so the mean inflow is near 1; check bulk flow responded over time
    assert 0.3 < u[1].mean() < 1.8
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-3


def test_channel3d_wall_clustered_grid():
    """tanh y-stretching (stretch_y) produces a wall-clustered grid
    the non-uniform coefficient tables solve stably."""
    import numpy as np

    from fluca_tpu.models.channel import setup_channel_3d

    ns = setup_channel_3d(N=(8, 16, 8), dt=0.005, max_steps=3,
                          stretch_y=2.0, perturb=0.05)
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    assert np.all(np.isfinite(u))
    wy = np.asarray(ns.mesh.widths(1))
    # clustered: wall cells much thinner than center cells; symmetric
    assert wy[0] < 0.2 * wy[len(wy) // 2]
    np.testing.assert_allclose(wy, wy[::-1], rtol=1e-12)


def test_stretched_channel_fixed_budget_solvers():
    """Solver-robustness pin for the wall-clustered grid (the
    BASELINE #5 channel512 config, reproduced small): the anisotropic
    Poisson makes the MG V-cycle a DIVERGENT Richardson iteration and
    breaks the damped-Jacobi momentum sweeps, so production_fast
    with the richardson outer blows up within a few steps — while the GCR
    outer (monotone residual under the same rough ABF preconditioner)
    with BiCGStab momentum + CG Schur stays stable at the same fixed
    budgets. bench.py channel512_bench relies on exactly this combo;
    this test fails if either behavior changes (a richardson fix OR a
    gcr regression), so the bench config gets revisited."""
    import numpy as np
    import pytest

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    def run(cfg, nsteps=10):
        import jax.numpy as jnp

        # 64x32x32 is the smallest shape where the richardson
        # divergence reproduces (at 32x16x16 the anisotropy is too
        # mild and it survives 30 steps)
        ns = setup_channel_3d(N=(64, 32, 32), dt=1e-3,
                              max_steps=10**9, stretch_y=2.0,
                              dtype=jnp.float32)
        ns.impl.cfg = cfg
        ns.step()
        ns.advance(nsteps)
        return float(ns.last_diag["ksp_rnorm"])

    cfg = CNLinearConfig.production_fast(2, 8, 6)
    cfg.outer_type = "gcr"
    cfg.mom_solver = "bicgstab"
    cfg.schur_solver = "cg"
    rnorm = run(cfg)
    assert np.isfinite(rnorm), rnorm

    # Negative control: the RICHARDSON outer (production_fast's
    # pre-r4 default; r4 switched the default to GCR exactly because
    # of this divergence) still blows up on the anisotropic grid.
    with pytest.raises(RuntimeError, match="diverged"):
        run(CNLinearConfig.production_fast(outer_type="richardson"),
            nsteps=10)
