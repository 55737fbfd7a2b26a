"""Projected-CG constraint solver (primal, fixed-iteration, jit-friendly).

Solves  min_x  0.5 (x - a_s)^T M (x - a_s) + 0.5 sum_i D_i [Jx - aref]_i-^2
over qacc = x, where []_- keeps a unilateral row active only while
J_i x < aref_i.  This is MuJoCo's soft-constraint dual made primal — the same
formulation MJX uses — with:

* inverse-inertia (M^-1) preconditioned Polak-Ribiere CG,
* an *exact* linesearch on the piecewise-quadratic 1-D restriction
  (a few Newton steps with the active set re-evaluated each step),
* a fixed iteration cap with optional tolerance early-exit.

The fixed-iteration mode is load-bearing: the reference FD engine pins the
solver to exactly ``iterations=30, tolerance=0`` during finite differencing
for determinism (/root/reference/src/mjderivative.cpp:241-242); with
``tolerance=0`` this loop runs exactly ``iterations`` times, bit-for-bit
reproducible and fully unrolled/vmapped by XLA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from .constraint import Efc


class SolveOut(NamedTuple):
    qacc: jnp.ndarray
    qfrc_constraint: jnp.ndarray
    niter: jnp.ndarray


def solve(M: jnp.ndarray, Mfac, qacc_smooth: jnp.ndarray, efc: Efc,
          warmstart: jnp.ndarray, iterations: int, tolerance: float,
          ls_iterations: int = 8) -> SolveOut:
    nv = qacc_smooth.shape[0]
    dt = qacc_smooth.dtype
    if efc.J.shape[0] == 0:
        return SolveOut(qacc_smooth, jnp.zeros(nv, dt),
                        jnp.zeros((), jnp.int32))

    x, niter = _solve_qacc(M, Mfac, qacc_smooth, efc.J, efc.D, efc.aref,
                           warmstart, iterations, tolerance, ls_iterations)
    jar = efc.J @ x - efc.aref
    f = jnp.where(jar < 0, -efc.D * jar, 0.0)
    qfrc_constraint = efc.J.T @ f
    return SolveOut(x, qfrc_constraint, niter.astype(jnp.int32))


@partial(jax.custom_jvp, nondiff_argnums=(7, 8, 9))
def _solve_qacc(M, Mfac, qacc_smooth, J, D, aref, warmstart,
                iterations, tolerance, ls_iterations):
    """qacc from the projected-CG solver, with *implicit differentiation*.

    Differentiating through the unrolled CG iterations is both wasteful
    (tangents propagate through every iteration) and unstable — in f32 the
    amplified tangent noise produced NaN humanoid Jacobians.  Instead the
    custom JVP below differentiates the optimality condition at the solution
    (MJX-style): with the active set A = {i : J_i x < aref_i, D_i > 0} frozen,
        R(x) = M (x - a_s) + J_A^T D_A (J_A x - aref_A) = 0
    so  (M + J_A^T D_A J_A) dx = -dR|_x,  one SPD solve per tangent.  The JVP
    is linear in the tangents, so JAX can transpose it — reverse-mode AD
    through `step` keeps working.

    Returns (x, niter): the CG iteration count rides along as a float (its
    tangent is identically zero) so solve stats stay observable through the
    custom-JVP wrapper (SURVEY.md §5 metrics row)."""
    return _solve_cg(M, Mfac, qacc_smooth, J, D, aref, warmstart,
                     iterations, tolerance, ls_iterations)


@_solve_qacc.defjvp
def _solve_qacc_jvp(iterations, tolerance, ls_iterations, primals, tangents):
    M, Mfac, qacc_smooth, J, D, aref, warmstart = primals
    dM, _, dqs, dJ, dD, daref, _ = tangents
    x, niter = _solve_cg(M, Mfac, qacc_smooth, J, D, aref, warmstart,
                         iterations, tolerance, ls_iterations)
    from ..ops import linalg
    jar = J @ x - aref
    act = (jar < 0) & (D > 0)
    Deff = jnp.where(act, D, 0.0)
    H = M + J.T @ (Deff[:, None] * J)
    # dtype-relative ridge (round-5): at deeply-penetrating states the
    # contact-stiffened H has cond ~ 1/eps_f32 and the pure-JAX Cholesky
    # hits a negative pivot -> NaN, which poisoned A, B at isolated
    # trajectory knots and through them every earlier knot's gains
    # (measured on the humanoid balance runs: max|K| = NaN while the
    # primal trajectory stayed finite).  The ridge caps the condition
    # number at ~1/ridge_rel; it perturbs tangents ~ridge_rel relatively,
    # far below the FD-vs-AD cross-check tolerances (1e-4) and below f64
    # golden resolution in x64 mode.
    ridge_rel = 1e-6 if H.dtype == jnp.float32 else 1e-12
    dmax = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H))), 1.0)
    H = H + (ridge_rel * dmax) * jnp.eye(H.shape[0], dtype=H.dtype)
    Hfac = linalg.cholesky(H)
    dR = (dM @ (x - qacc_smooth) - M @ dqs
          + dJ.T @ (Deff * jar)
          + J.T @ (jnp.where(act, dD, 0.0) * jar)
          + J.T @ (Deff * (dJ @ x - daref)))
    dx = -linalg.cho_solve(Hfac, dR)
    return (x, niter), (dx, jnp.zeros_like(niter))


def _solve_cg(M, Mfac, qacc_smooth, J, D, aref, warmstart,
              iterations, tolerance, ls_iterations):
    dt = qacc_smooth.dtype

    def cost(x):
        dx = x - qacc_smooth
        jar = J @ x - aref
        pen = jnp.where(jar < 0, jar, 0.0)
        return 0.5 * dx @ (M @ dx) + 0.5 * jnp.sum(D * pen * pen)

    def grad(x):
        dx = x - qacc_smooth
        jar = J @ x - aref
        f = jnp.where(jar < 0, D * jar, 0.0)
        return M @ dx + J.T @ f

    # MuJoCo warmstart policy: start from the better of (qacc_warmstart,
    # qacc_smooth)
    x0 = jnp.where(cost(warmstart) < cost(qacc_smooth),
                   warmstart, qacc_smooth)

    def linesearch(x, p):
        """Exact minimization of the piecewise quadratic along p."""
        Jp = J @ p
        jar0 = J @ x - aref
        pMp = p @ (M @ p)
        pMdx = p @ (M @ (x - qacc_smooth))

        def phi_prime(alpha):
            jar = jar0 + alpha * Jp
            act = jar < 0
            d1 = pMdx + alpha * pMp + jnp.sum(
                jnp.where(act, D * jar * Jp, 0.0))
            d2 = pMp + jnp.sum(jnp.where(act, D * Jp * Jp, 0.0))
            return d1, d2

        def body(_, alpha):
            d1, d2 = phi_prime(alpha)
            return alpha - d1 / jnp.maximum(d2, 1e-15)

        return jax.lax.fori_loop(0, ls_iterations, body, jnp.zeros((), dt))

    def cg_body(carry):
        x, g, Mg, p, it, _ = carry
        alpha = linesearch(x, p)
        x_new = x + alpha * p
        g_new = grad(x_new)
        Mg_new = linalg.cho_solve(Mfac, g_new)
        beta = jnp.maximum(
            0.0, (g_new @ (Mg_new - Mg)) / jnp.maximum(g @ Mg, 1e-15))
        p_new = -Mg_new + beta * p
        done = jnp.sqrt(g_new @ Mg_new) < tolerance
        return (x_new, g_new, Mg_new, p_new, it + 1, done)

    def cg_cond(carry):
        _, _, _, _, it, done = carry
        return (it < iterations) & jnp.logical_not(done)

    g0 = grad(x0)
    Mg0 = linalg.cho_solve(Mfac, g0)
    # niter is carried as a float so the custom-JVP wrapper can pass it
    # through with a zero tangent (integer outputs need float0 tangents)
    init = (x0, g0, Mg0, -Mg0, jnp.zeros((), dt),
            jnp.zeros((), jnp.bool_))
    if tolerance == 0.0:
        # pinned mode (the FD determinism protocol,
        # /root/reference/src/mjderivative.cpp:241-242): static trip count,
        # bit-reproducible
        x, g, _, _, niter, _ = jax.lax.fori_loop(
            0, iterations, lambda _, c: cg_body(c), init)
    else:
        x, g, _, _, niter, _ = jax.lax.while_loop(cg_cond, cg_body, init)
    return x, niter
