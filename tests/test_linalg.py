"""Pure-JAX linalg kernels (ops/linalg.py) — including the jit-vs-eager
regression guard for the XLA:CPU miscompile that motivated them."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqg_mujoco_tpu.ops import linalg


def _spd(n, seed):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    return A @ A.T + n * np.eye(n)


def test_cholesky_matches_numpy():
    for n in (1, 2, 3, 6, 27):
        A = _spd(n, n)
        L = np.asarray(linalg.cholesky(jnp.asarray(A)))
        np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-12,
                                   atol=1e-12)


def test_cho_solve_vector_and_matrix():
    A = _spd(6, 0)
    L = linalg.cholesky(jnp.asarray(A))
    b = np.random.RandomState(1).randn(6)
    B = np.random.RandomState(2).randn(6, 4)
    np.testing.assert_allclose(np.asarray(linalg.cho_solve(L, jnp.asarray(b))),
                               np.linalg.solve(A, b), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(linalg.cho_solve(L, jnp.asarray(B))),
                               np.linalg.solve(A, B), rtol=1e-10, atol=1e-12)


def test_non_pd_gives_nan():
    A = -jnp.eye(3)
    L = linalg.cholesky(A)
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_jit_matches_eager_in_scan():
    """Guard for the XLA:CPU LAPACK-custom-call miscompile: a scan body doing
    cholesky+solve must give identical results jitted and eager."""
    def body(carry, x):
        L = linalg.cholesky(x)
        k = linalg.cho_solve(L, carry)
        return k, k

    xs = jnp.stack([jnp.asarray(_spd(4, s)) for s in range(16)])
    init = jnp.ones(4)
    eager = jax.lax.scan(body, init, xs)[1]
    jitted = jax.jit(lambda i, x: jax.lax.scan(body, i, x))(init, xs)[1]
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(jitted))


def test_grad_through_cholesky():
    A = jnp.asarray(_spd(5, 3))
    b = jnp.arange(5.0)

    def f(A):
        return jnp.sum(linalg.solve_psd(A, b) ** 2)

    g = jax.grad(f)(A)
    # finite-difference check
    eps = 1e-6
    E = jnp.zeros_like(A).at[1, 2].set(eps).at[2, 1].set(eps)
    fd = (f(A + E) - f(A - E)) / (2 * eps)
    assert abs(float(g[1, 2] + g[2, 1]) - float(fd)) < 1e-5
