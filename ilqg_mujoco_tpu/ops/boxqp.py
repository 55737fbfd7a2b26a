"""Box-constrained QP solver (projected Newton) for control-limited iLQG.

The reference README cites Tassa et al.'s iLQG work but its solver ignores
the actuator control ranges its own assets declare
(/root/reference/res/hopper.xml:6,32-34 `ctrlrange`): MuJoCo silently clamps
ctrl inside the actuation stage, so the optimizer reasons about controls the
plant never applies.  This module implements the fix from Tassa, Mansard &
Todorov, "Control-Limited Differential Dynamic Programming" (ICRA 2014): at
each knot the backward pass solves

    min_x  0.5 x^T Q x + g^T x   s.t.  lo <= x <= hi

with a projected-Newton active-set method, and feedback gains are computed
on the free subspace only (clamped controls get zero feedback rows).

TPU-native shape: the solver is a fixed-iteration ``lax.scan`` (no
data-dependent trips), the free/clamped active set is a boolean mask (no
gather/scatter of dynamic extents), and the free-subspace Newton system is
solved by masking Q to identity on clamped rows/cols — static shapes
throughout, so the whole thing vmaps over knots and problem instances and
fuses into the surrounding backward pass.  Q is SPD by construction
(Quu + mu*I), so the masked system is too.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import linalg


class BoxQPOut(NamedTuple):
    x: jnp.ndarray        # (n,) argmin, inside the box
    free: jnp.ndarray     # (n,) bool: dims NOT clamped at a bound
    Lfree: jnp.ndarray    # (n, n) Cholesky factor of the masked free system
    pd: jnp.ndarray       # () bool: masked system was positive definite


def _masked_system(Q: jnp.ndarray, free: jnp.ndarray) -> jnp.ndarray:
    """Q restricted to the free subspace, identity on clamped dims.

    Solving (Qf) x = m(b) with this matrix equals solving the free-subspace
    subsystem and returning 0 on clamped dims (no dynamic-shape gathers)."""
    f = free.astype(Q.dtype)
    outer = f[:, None] * f[None, :]
    eye = jnp.eye(Q.shape[-1], dtype=Q.dtype)
    return Q * outer + eye * (1.0 - f)


def boxqp(Q: jnp.ndarray, g: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
          x0: jnp.ndarray, iters: int = 8,
          alphas=(1.0, 0.5, 0.25, 0.1, 0.05)) -> BoxQPOut:
    """Minimize 0.5 x'Qx + g'x over the box [lo, hi] from warm start x0.

    Fixed ``iters`` projected-Newton steps; each step (a) identifies the
    active set from the current gradient, (b) takes a Newton step on the
    free subspace, (c) projects a fixed alpha grid onto the box and keeps
    the best objective (parallel linesearch, vmapped like the iLQG one).

    With lo=-inf/hi=+inf the active set is always empty and one iteration
    reproduces the unconstrained Newton solve -Q^{-1} g exactly."""
    dt = Q.dtype
    eps = jnp.asarray(1e-8, dt)
    x_init = jnp.clip(x0, lo, hi)
    al = jnp.asarray(alphas, dt)

    def obj(x):
        return 0.5 * x @ (Q @ x) + g @ x

    def body(x, _):
        grad = g + Q @ x
        clamped = (((x <= lo + eps) & (grad > 0))
                   | ((x >= hi - eps) & (grad < 0)))
        free = ~clamped
        Qf = _masked_system(Q, free)
        L = linalg.cholesky(Qf)
        pd = jnp.all(jnp.isfinite(L))
        Ls = jnp.where(pd, L, jnp.eye(Q.shape[-1], dtype=dt))
        dx = -linalg.cho_solve(Ls, jnp.where(free, grad, 0.0))
        cands = jnp.clip(x[None] + al[:, None] * dx[None], lo, hi)
        vals = jax.vmap(obj)(cands)
        best = jnp.argmin(vals)
        x_new = jnp.where(vals[best] < obj(x), cands[best], x)
        return x_new, None

    x, _ = jax.lax.scan(body, x_init, None, length=iters)

    # final active set + factor (for the caller's feedback-gain solves)
    grad = g + Q @ x
    clamped = (((x <= lo + eps) & (grad > 0))
               | ((x >= hi - eps) & (grad < 0)))
    free = ~clamped
    L = linalg.cholesky(_masked_system(Q, free))
    pd = jnp.all(jnp.isfinite(L))
    Ls = jnp.where(pd, L, jnp.eye(Q.shape[-1], dtype=dt))
    return BoxQPOut(x=x, free=free, Lfree=Ls, pd=pd)
