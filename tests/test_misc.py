"""Coverage gaps: options JSON, bc validation, registry errors,
converged reasons, fgmres restart edge."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import (
    BCType,
    BoundaryCondition,
    validate_bcs,
    zero_velocity_bc,
)
from fluca_tpu.solvers.krylov import fgmres
from fluca_tpu.utils.options import Options
from fluca_tpu.utils.registry import Registry


def test_options_from_json(tmp_path):
    p = tmp_path / "o.json"
    p.write_text(json.dumps({"ns_density": 2.5, "cart_grid_x": 16}))
    o = Options.from_json(str(p))
    assert o.get_real("ns_density") == 2.5
    assert o.get_int("cart_grid_x") == 16


def test_bc_validation():
    m = CartMesh.create((4, 4), (True, False))
    m.set_uniform_coordinates(0, 1, 0, 1)
    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    validate_bcs(m, [per, per, wall, wall])
    with pytest.raises(AssertionError):
        validate_bcs(m, [wall, wall, wall, wall])  # periodic axis
    with pytest.raises(AssertionError):
        validate_bcs(m, [per, per, per, per])  # non-periodic axis
    with pytest.raises(ValueError):
        BoundaryCondition(BCType.VELOCITY)  # missing callback
    with pytest.raises(ValueError):
        BoundaryCondition(BCType.PRESSURE_OUTLET)


def test_registry_errors():
    r = Registry("widget")
    r.register("a", lambda: 1)
    assert r.create("a") == 1
    assert "a" in r and r.names() == ["a"]
    with pytest.raises(KeyError):
        r.create("missing")


def test_ns_converged_reasons():
    from fluca_tpu.models.tgv import setup_taylor_green_2d
    from fluca_tpu.ns.ns import NSConvergedReason

    ns = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    assert ns.solve() == NSConvergedReason.CONVERGED_ITS
    ns2 = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    ns2.max_steps = None
    ns2.max_time = 0.1
    assert ns2.solve() == NSConvergedReason.CONVERGED_TIME


def test_fgmres_exact_at_restart_boundary():
    """System solvable in exactly `restart` iterations."""
    n = 6
    rng = np.random.default_rng(0)
    A = np.eye(n) * 2 + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = fgmres(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-12,
                 restart=n, maxiter=3 * n)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-8
    )
