"""Pure-JAX dense linear algebra for small SPD systems (n <= ~64).

Why not jnp.linalg / jax.scipy.linalg?  Two reasons:

1. On CPU those lower to LAPACK *custom calls* (potrf/getrs); in this
   image's jax 0.9.0 a graph combining them with scan+vmap+hessian
   miscompiles — jit results diverge from eager and the process heap is
   corrupted (found while building the iLQR backward pass; see
   tests/test_linalg.py for the regression guard).  The pure-jnp versions
   compile to plain XLA HLO everywhere.
2. On TPU, tiny factorizations are VPU work; an unrolled static-shape
   Cholesky fuses into the surrounding scan body instead of calling out to a
   generic batched kernel.

Every matrix here is SPD by construction (mass matrix, M + h*D,
Quu + mu*I, -T = 2 B^T V B + 2R with the LM shift — the negated-SPD solve
SURVEY.md §2b.3 prescribes for the reference's LDLT at inc/ilqr.h:167).
All functions are differentiable and vmap over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky(A: jnp.ndarray) -> jnp.ndarray:
    """Lower-Cholesky of an SPD matrix, unrolled over the (static) dim.

    Returns NaNs (like jnp.linalg.cholesky) when A is not PD — callers use
    jnp.isfinite as the PD test."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        d = jnp.sqrt(A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1))
        L = L.at[..., j, j].set(d)
        if j + 1 < n:
            col = (A[..., j + 1:, j]
                   - jnp.einsum("...ik,...k->...i", L[..., j + 1:, :j],
                                L[..., j, :j])) / d[..., None]
            L = L.at[..., j + 1:, j].set(col)
    return L


def solve_tri_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L x = b (L lower-triangular), unrolled forward substitution."""
    n = L.shape[-1]
    x = jnp.zeros_like(b)
    for i in range(n):
        x = x.at[..., i].set(
            (b[..., i] - jnp.sum(L[..., i, :i] * x[..., :i], axis=-1))
            / L[..., i, i])
    return x


def solve_tri_upper_t(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y (back substitution with the lower factor)."""
    n = L.shape[-1]
    x = jnp.zeros_like(y)
    for i in reversed(range(n)):
        x = x.at[..., i].set(
            (y[..., i] - jnp.sum(L[..., i + 1:, i] * x[..., i + 1:],
                                 axis=-1)) / L[..., i, i])
    return x


def cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = cholesky(A).  b may be a vector (..., n) or a
    matrix (..., n, m) of stacked right-hand sides."""
    if b.ndim == L.ndim:          # matrix RHS: solve per column
        y = jax.vmap(lambda col: cho_solve(L, col),
                     in_axes=-1, out_axes=-1)(b)
        return y
    return solve_tri_upper_t(L, solve_tri_lower(L, b))


def solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD system A x = b."""
    return cho_solve(cholesky(A), b)
