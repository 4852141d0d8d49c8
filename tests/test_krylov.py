import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.solvers.krylov import bicgstab, cg, fgmres


def random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    return Q @ Q.T + n * np.eye(n)


def test_cg_dense_spd():
    n = 40
    A = random_spd(n)
    b = np.random.default_rng(1).standard_normal(n)
    Aj = jnp.asarray(A)
    res = cg(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-10, maxiter=200)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-6
    )
    assert bool(res.converged)


def test_cg_pytree_and_preconditioner():
    n = 30
    A = random_spd(n, 2)
    b = np.random.default_rng(3).standard_normal(n)
    Aj = jnp.asarray(A)
    d = jnp.asarray(np.diag(A))

    def op(x):
        flat = jnp.concatenate([x["a"], x["b"]])
        y = Aj @ flat
        return {"a": y[: n // 2], "b": y[n // 2 :]}

    def M(r):
        flat = jnp.concatenate([r["a"], r["b"]]) / d
        return {"a": flat[: n // 2], "b": flat[n // 2 :]}

    bt = {"a": jnp.asarray(b[: n // 2]), "b": jnp.asarray(b[n // 2 :])}
    res = cg(op, bt, rtol=1e-10, maxiter=200, M=M)
    x = np.concatenate([np.asarray(res.x["a"]), np.asarray(res.x["b"])])
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-6)


def test_cg_singular_with_projection():
    """Poisson-like singular system: solvable rhs, mean-zero pinning."""
    n = 20
    # 1-D periodic Laplacian (singular, nullspace = const)
    A = -2 * np.eye(n) + np.roll(np.eye(n), 1, 0) + np.roll(np.eye(n), -1, 0)
    A = -A  # positive semidefinite
    x_true = np.sin(2 * np.pi * np.arange(n) / n)
    x_true -= x_true.mean()
    b = A @ x_true
    Aj = jnp.asarray(A)

    def proj(x):
        return x - jnp.mean(x)

    res = cg(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-12, maxiter=500,
             project=proj)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_bicgstab_nonsymmetric():
    n = 40
    rng = np.random.default_rng(4)
    A = np.eye(n) * 4 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = bicgstab(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-10,
                   maxiter=300)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-5, atol=1e-8
    )


def test_fgmres_nonsymmetric():
    n = 50
    rng = np.random.default_rng(5)
    A = np.eye(n) * 3 + 0.4 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = fgmres(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-10,
                 restart=20, maxiter=200)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-5, atol=1e-8
    )
    assert bool(res.converged)


def test_fgmres_pytree_with_variable_preconditioner():
    """Flexible GMRES tolerates a nonlinear/iterative preconditioner."""
    n = 40
    A = random_spd(n, 6)
    b = np.random.default_rng(7).standard_normal(n)
    Aj = jnp.asarray(A)
    d = jnp.asarray(np.diag(A))

    def op(x):
        return {"u": Aj @ x["u"]}

    def M(r):
        # inner Jacobi iterations (changes per call -> needs FGMRES)
        x = r["u"] / d
        for _ in range(3):
            x = x + (r["u"] - Aj @ x) / d
        return {"u": x}

    res = fgmres(op, {"u": jnp.asarray(b)}, rtol=1e-10, restart=15,
                 maxiter=150, M=M)
    np.testing.assert_allclose(
        np.asarray(res.x["u"]), np.linalg.solve(A, b), rtol=1e-5
    )


def test_fgmres_under_jit():
    n = 24
    A = random_spd(n, 8)
    b = np.random.default_rng(9).standard_normal(n)
    Aj = jnp.asarray(A)

    @jax.jit
    def solve(bb):
        return fgmres(lambda x: Aj @ x, bb, rtol=1e-10, restart=10,
                      maxiter=100).x

    np.testing.assert_allclose(
        np.asarray(solve(jnp.asarray(b))), np.linalg.solve(A, b), rtol=1e-5
    )
