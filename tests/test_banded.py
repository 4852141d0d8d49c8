import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.ops.banded import AxisStencil, shifted
from fluca_tpu.ops.fdcoeffs import fd_weights, interp_weights


def test_shifted_nonperiodic():
    x = jnp.arange(1.0, 6.0)  # [1..5]
    y = shifted(x, 0, 1, 5, False)
    np.testing.assert_allclose(y, [2, 3, 4, 5, 0])
    y = shifted(x, 0, -1, 5, False)
    np.testing.assert_allclose(y, [0, 1, 2, 3, 4])
    # cell -> face (n_out = n_in + 1)
    y = shifted(x, 0, -1, 6, False)
    np.testing.assert_allclose(y, [0, 1, 2, 3, 4, 5])
    y = shifted(x, 0, 0, 6, False)
    np.testing.assert_allclose(y, [1, 2, 3, 4, 5, 0])
    # face -> cell
    y = shifted(x, 0, 1, 4, False)
    np.testing.assert_allclose(y, [2, 3, 4, 5])


def test_shifted_periodic():
    x = jnp.arange(1.0, 5.0)
    y = shifted(x, 0, 1, 4, True)
    np.testing.assert_allclose(y, [2, 3, 4, 1])
    y = shifted(x, 0, -1, 4, True)
    np.testing.assert_allclose(y, [4, 1, 2, 3])


@pytest.mark.parametrize("periodic", [False, True])
def test_axis_stencil_matches_dense(periodic):
    rng = np.random.default_rng(0)
    n_in, n_out = 8, 8 if periodic else 9
    bands = {
        off: rng.standard_normal(n_out) for off in (-2, -1, 0, 1)
    }
    st = AxisStencil.from_dict(0, n_out, periodic, bands)
    A = st.to_dense(n_in)
    x = rng.standard_normal(n_in)
    y = st.apply(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-12)


def test_axis_stencil_2d_broadcast():
    n = 6
    bands = {-1: np.ones(n), 0: -2.0 * np.ones(n), 1: np.ones(n)}
    st = AxisStencil.from_dict(1, n, True, bands)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, n)))
    y = st.apply(x)
    expect = np.roll(x, 1, 1) - 2 * np.asarray(x) + np.roll(x, -1, 1)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-12)


def test_fd_weights_uniform():
    # classic central second derivative
    w = fd_weights([-1.0, 0.0, 1.0], 0.0, 2)
    np.testing.assert_allclose(w, [1.0, -2.0, 1.0], atol=1e-12)
    w = fd_weights([-1.0, 0.0, 1.0], 0.0, 1)
    np.testing.assert_allclose(w, [-0.5, 0.0, 0.5], atol=1e-12)


def test_fd_weights_nonuniform_exactness():
    # derivative weights must be exact for polynomials up to degree n-1
    xs = np.array([0.0, 0.3, 1.0, 2.2])
    x0 = 0.7
    for m in range(3):
        w = fd_weights(xs, x0, m)
        for deg in range(4):
            f = xs**deg
            import math

            exact = (
                math.factorial(deg)
                / math.factorial(deg - m)
                * x0 ** (deg - m)
                if deg >= m
                else 0.0
            )
            np.testing.assert_allclose(
                w @ f, exact, atol=1e-9, err_msg=f"m={m} deg={deg}"
            )


def test_interp_weights():
    xs = [0.0, 1.0]
    np.testing.assert_allclose(interp_weights(xs, 0.25), [0.75, 0.25])
