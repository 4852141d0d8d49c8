import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d
from fluca_tpu.utils.debug import (
    check_state_finite,
    continuity_residual,
    state_finite,
)


def test_state_finite_detection():
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    assert state_finite(ns.state)
    bad = dict(ns.state)
    bad["p"] = bad["p"].at[0, 0].set(jnp.nan)
    assert not state_finite(bad)
    with pytest.raises(FloatingPointError):
        check_state_finite(bad)


def test_continuity_residual_small_after_step():
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    ns.solve()
    assert continuity_residual(ns) < 1e-4


def test_determinism_same_bits():
    """Two identical runs must agree bit-for-bit (deterministic
    collectives/compilation — the reproducibility guarantee the
    reference gets from deterministic MPI reductions)."""
    a = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    a.solve()
    b = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    b.solve()
    np.testing.assert_array_equal(
        np.asarray(a.state["p"]), np.asarray(b.state["p"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["v"][0]), np.asarray(b.state["v"][0])
    )
