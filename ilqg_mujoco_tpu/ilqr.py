"""iLQR/iLQG trajectory optimizer: the TPU-native rebuild of the reference's
header-only solver (/root/reference/inc/ilqr.h).

Structure
---------
The reference interleaves one linearization per knot *inside* the backward
loop (inc/ilqr.h:153-154), serializing N+1 expensive FD passes.  Here each
iteration is:

1. ``forward_pass`` — one :func:`jax.lax.scan` over the horizon applying the
   affine policy u = K (x - x*) + k + u* and stepping the full physics
   (inc/ilqr.h:116-130);
2. ``linearize_traj`` — ALL N+1 knots linearized in one batched vmap
   (ops/linearize.py), the key TPU restructuring;
3. ``backward_pass`` — the Riccati-style recursion as a reverse
   :func:`jax.lax.scan` with tiny (2nv x 2nv) matrix algebra per step.

Modes
-----
* ``compat`` — reproduces the reference recursion *exactly*, including its
  quirks (SURVEY.md §7.0): fixed LM shift mu=1000 added to V and never
  removed (inc/ilqr.h:65,166,168), rank-1 gradient-outer-product Hessians
  Q=q^T q, R=r^T r (:157-158), the knot-gap term c = x*_{t+1} - x*_t
  (:161-163), full-magnitude k (no linesearch), and K/k[terminal] unused.
  K/k are zero-initialized (the reference leaves them uninitialized and uses
  them in the first forward pass — the one documented non-determinism we fix;
  SURVEY.md §7.0.2).
* ``tassa`` — modern iLQG: exact cost quadratics via autodiff, adaptive
  Levenberg-Marquardt regularization, and a vmapped parallel backtracking
  linesearch (all alphas rolled out at once, best accepted) — what the
  reference README advertises but does not implement (README.md:12-13).

Time indexing is forward (t=0 initial, t=N terminal); the reference stores
trajectories reverse-indexed (dArray[N]=initial, inc/ilqr.h:52) — golden
comparators must map indices, nothing else differs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ops import linalg
from .ops.boxqp import boxqp
from .ops.linearize import (CostFn, LinearizeConfig, LinOut, linearize_traj)
from .physics import forward as fwd
from .physics import spatial
from .physics.model import (JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model,
                            State)


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 20                 # N (inverted_pendulum.h:22)
    iterations: int = 10              # per solve (inverted_pendulum.h:24)
    mode: str = "compat"              # 'compat' | 'tassa'
    mu: float = 1000.0                # fixed LM shift (inc/ilqr.h:65)
    lin: LinearizeConfig = LinearizeConfig()
    # tassa-mode options
    mu_min: float = 1e-6
    mu_max: float = 1e10
    mu_factor: float = 1.6
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.05, 0.01)
    reg_init: float = 1e-6
    # backward-pass executor (tassa mode): 'scan' = sequential reverse
    # lax.scan (reference-shaped); 'assoc' = associative-scan parallel
    # Riccati (Särkkä & García-Fernández-style conditional value functions):
    # O(log N) depth on TPU instead of O(N) — pays off at long horizons
    backward: str = "scan"
    # control-limited iLQG (Tassa/Mansard/Todorov ICRA 2014): respect the
    # actuator ctrlrange the reference assets declare but its solver ignores
    # (res/hopper.xml:6; MuJoCo clamps in the actuation stage regardless —
    # physics/smooth.py).  tassa+scan mode only.
    control_limits: bool = False
    boxqp_iters: int = 8
    # scaled value recursion (tassa+scan): carry V/s with log s tracked
    # separately, renormalizing every step.  The recursion is exact in
    # infinite precision (gains depend only on value/cost RATIOS at each
    # knot) and eliminates the f32 Vxx overflow that otherwise caps stiff-
    # contact horizons at ~16 knots (|A|~15 through solref=.02 contacts =>
    # ||Vxx|| ~ 15^(2k) > f32 max around k=16; BENCH_NOTES.md round 2).
    # Cost-curvature terms underflow gracefully (to 0) instead of
    # overflowing (to inf) once the value function dominates.
    value_scaling: bool = False

    def __post_init__(self):
        if self.mode not in ("compat", "tassa"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.backward not in ("scan", "assoc"):
            raise ValueError(f"unknown backward {self.backward!r}")
        if self.control_limits and self.mode != "tassa":
            raise ValueError(
                "control_limits requires mode='tassa': the compat backward "
                "pass is the reference recursion, which is limit-blind — "
                "clipping only the rollout would silently optimize controls "
                "the backward pass never sees")
        if self.control_limits and self.backward != "scan":
            raise ValueError(
                "control_limits requires backward='scan': the boxQP active "
                "set couples knots sequentially, which the associative-scan "
                "value recursion cannot express")
        if self.value_scaling and self.backward != "scan":
            raise ValueError(
                "value_scaling requires backward='scan': the associative-"
                "scan elements carry unnormalized value quadratics, so the "
                "flag would be silently ignored (and the humanoid default "
                "would silently revert to the overflowing recursion)")


class ILQRState(NamedTuple):
    """Persistent solver state (the ILQR object's data, inc/ilqr.h:44-65):
    trajectory snapshots, gains, regularizer."""
    traj: State          # stacked (N+1) knots, knot t carries its ctrl u_t
    K: jnp.ndarray       # (N+1, nu, 2nv)
    k: jnp.ndarray       # (N+1, nu)
    mu: jnp.ndarray      # () adaptive LM parameter (tassa mode)


def state_diff(model: Model, s_qpos, s_qvel, r_qpos, r_qvel) -> jnp.ndarray:
    """Tangent-space state difference x - x* in R^{2nv}.

    For nq == nv this is the reference's contiguous [qpos; qvel] subtraction
    (inc/ilqr.h:90,126); for quaternion joints (humanoid free joint) the
    orientation difference is the quaternion log map — the generalization the
    reference's memory-map trick cannot express (SURVEY.md §1 state-vector
    contract)."""
    if model.nq == model.nv:
        return jnp.concatenate([s_qpos - r_qpos, s_qvel - r_qvel])
    parts = []
    for j in range(model.njnt):
        jt = int(model.jnt_type[j])
        qadr = int(model.jnt_qposadr[j])
        if jt in (JNT_SLIDE, JNT_HINGE):
            parts.append(s_qpos[qadr:qadr + 1] - r_qpos[qadr:qadr + 1])
        elif jt == JNT_BALL:
            parts.append(spatial.quat_sub(s_qpos[qadr:qadr + 4],
                                          r_qpos[qadr:qadr + 4]))
        elif jt == JNT_FREE:
            parts.append(s_qpos[qadr:qadr + 3] - r_qpos[qadr:qadr + 3])
            parts.append(spatial.quat_sub(s_qpos[qadr + 3:qadr + 7],
                                          r_qpos[qadr + 3:qadr + 7]))
    return jnp.concatenate(parts + [s_qvel - r_qvel])


def _broadcast_state(x0: State, n: int) -> State:
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), x0)


def init_solver(model: Model, x0: State, cfg: ILQRConfig) -> ILQRState:
    """Initial trajectory: roll the initial state forward under its current
    ctrl (the ILQR ctor loop, inc/ilqr.h:82-87), K/k = 0."""
    def body(s, _):
        return fwd.step(model, s), s
    _, traj = jax.lax.scan(body, x0, None, length=cfg.horizon + 1)
    nv2 = 2 * model.nv
    return ILQRState(
        traj=traj,
        K=jnp.zeros((cfg.horizon + 1, model.nu, nv2), x0.qpos.dtype),
        k=jnp.zeros((cfg.horizon + 1, model.nu), x0.qpos.dtype),
        mu=jnp.asarray(cfg.reg_init, x0.qpos.dtype),
    )


def ctrl_bounds(model: Model, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-actuator (lo, hi) ctrl bounds; unlimited actuators get a huge
    finite box (keeps boxqp arithmetic NaN-free)."""
    big = jnp.asarray(1e9, dt)
    limited = jnp.asarray(model.actuator_ctrllimited)
    lo = jnp.where(limited, jnp.asarray(model.actuator_ctrlrange[:, 0], dt),
                   -big)
    hi = jnp.where(limited, jnp.asarray(model.actuator_ctrlrange[:, 1], dt),
                   big)
    return lo, hi


def forward_pass(model: Model, x0: State, sol: ILQRState,
                 cfg: ILQRConfig, alpha=1.0) -> State:
    """Roll out u = K (x - x*) + alpha*k + u* from x0 through the full
    nonlinear dynamics (inc/ilqr.h:116-130; alpha=1 is the reference's
    full-magnitude application).

    In control-limited mode the policy output is clipped to the actuator
    box, so the *stored* (and costed) controls are the ones the plant
    actually applies — without the flag the clamp happens invisibly inside
    the actuation stage (physics/smooth.py) like the reference."""
    if cfg.control_limits:
        lo, hi = ctrl_bounds(model, sol.k.dtype)

    def body(s, inp):
        K_t, k_t, ref_knot = inp
        dx = state_diff(model, s.qpos, s.qvel, ref_knot.qpos, ref_knot.qvel)
        u = K_t @ dx + alpha * k_t + ref_knot.ctrl
        if cfg.control_limits:
            u = jnp.clip(u, lo, hi)
        knot = s.replace(ctrl=u)
        return fwd.step(model, knot), knot
    _, traj = jax.lax.scan(body, x0, (sol.K, sol.k, sol.traj))
    return traj


def _traj_cost(cost_fn: CostFn, traj: State) -> jnp.ndarray:
    return jnp.sum(jax.vmap(cost_fn)(traj.qpos, traj.qvel, traj.ctrl))


# ---------------------------------------------------------------------------
# compat backward pass: the reference recursion, verbatim math
# ---------------------------------------------------------------------------

def backward_pass_compat(model: Model, traj: State, lin: LinOut,
                         cfg: ILQRConfig):
    """inc/ilqr.h:133-176 as a reverse scan.  All quirks intentional."""
    N = cfg.horizon
    nv2, nu = 2 * model.nv, model.nu
    dt = lin.A.dtype
    mu = jnp.asarray(cfg.mu, dt)

    # initV (inc/ilqr.h:100-107): terminal knot gradient outer product
    v0 = lin.gx[N]
    V0 = jnp.outer(v0, v0)

    # knot gaps c_t = x*_{t+1} - x*_t (inc/ilqr.h:161-163)
    diffs = jax.vmap(lambda a, b, c, d: state_diff(model, a, b, c, d))(
        traj.qpos[1:], traj.qvel[1:], traj.qpos[:-1], traj.qvel[:-1])

    def body(carry, inp):
        V, v = carry
        A, B, q, r, c = inp
        V = 0.5 * (V + V.T)
        Q = jnp.outer(q, q)
        R = jnp.outer(r, r)
        V = V + mu * jnp.eye(nv2, dtype=dt)       # shift never removed (:168)
        # reference: (-2 B^T V B - 2R).ldlt() (inc/ilqr.h:167); -T is SPD
        # under the LM shift, so solve the negated system with Cholesky
        # (SURVEY.md §2b.3) — pure-JAX (ops/linalg.py)
        negT = 2.0 * B.T @ V @ B + 2.0 * R
        Lt = linalg.cholesky(negT)
        K = -linalg.cho_solve(Lt, 2.0 * B.T @ V @ A)
        k = -linalg.cho_solve(Lt, B.T @ (v + 2.0 * V @ c) + r)
        ABK = A + B @ K
        V_new = ABK.T @ V @ ABK + Q + K.T @ R @ K
        # NOTE: the reference assigns *V first and the *v update then reads
        # the NEW V (inc/ilqr.h:173-174) — replicated deliberately
        v_new = (2.0 * (B @ k + c) @ V_new @ ABK + v @ ABK + q
                 + 2.0 * (k @ R @ K))
        return (V_new, v_new), (K, k)

    xs = (lin.A[:N], lin.B[:N], lin.gx[:N], lin.gu[:N], diffs)
    _, (K, k) = jax.lax.scan(body, (V0, v0), xs, reverse=True)
    # terminal gains unused (reference's K/k[0]): keep zeros
    K = jnp.concatenate([K, jnp.zeros((1, nu, nv2), dt)])
    k = jnp.concatenate([k, jnp.zeros((1, nu), dt)])
    return K, k


# ---------------------------------------------------------------------------
# tassa (default) backward pass: proper iLQG
# ---------------------------------------------------------------------------

def _cost_quadratics(cost_fn: CostFn, model: Model, traj: State):
    """Exact cost expansion per knot via autodiff (replaces the reference's
    rank-1 approximations)."""
    def at_knot(qpos, qvel, ctrl):
        nv = model.nv

        def f(dx, du):
            dq, dv = dx[:nv], dx[nv:]
            qp = fwd.integrate_pos(model, qpos, dq, 1.0)
            return cost_fn(qp, qvel + dv, ctrl + du)

        z_x = jnp.zeros(2 * nv, qpos.dtype)
        z_u = jnp.zeros(model.nu, qpos.dtype)
        lx = jax.grad(f, 0)(z_x, z_u)
        lu = jax.grad(f, 1)(z_x, z_u)
        lxx = jax.hessian(f, 0)(z_x, z_u)
        luu = jax.hessian(f, 1)(z_x, z_u)
        lux = jax.jacfwd(jax.grad(f, 1), 0)(z_x, z_u)
        return lx, lu, lxx, luu, lux

    return jax.vmap(at_knot)(traj.qpos, traj.qvel, traj.ctrl)


def backward_pass_tassa(model: Model, traj: State, lin: LinOut,
                        cost_fn: CostFn, mu, cfg: ILQRConfig):
    """Standard iLQG backward recursion with LM-regularized Quu.

    Returns (K, k, dV1, dV2, ok): expected improvement terms and a
    positive-definiteness flag for the mu adaptation loop."""
    N = cfg.horizon
    nv2, nu = 2 * model.nv, model.nu
    dt = lin.A.dtype
    lx, lu, lxx, luu, lux = _cost_quadratics(cost_fn, model, traj)

    Vx0, Vxx0 = lx[N], lxx[N]
    if cfg.control_limits:
        ulo, uhi = ctrl_bounds(model, dt)

    def body(carry, inp):
        # Vx/Vxx are the value function divided by s = exp(log_s); log_s is
        # identically 0 unless cfg.value_scaling.  Gains are ratios, so
        # computing them from (l*/s + transport of V/s) with mu/s is exact.
        Vx, Vxx, log_s, dV1, dV2, ok = carry
        A, B, lx_t, lu_t, lxx_t, luu_t, lux_t, u_t = inp
        inv_s = jnp.exp(-log_s)
        Qx = lx_t * inv_s + A.T @ Vx
        Qu = lu_t * inv_s + B.T @ Vx
        Qxx = lxx_t * inv_s + A.T @ Vxx @ A
        Quu = luu_t * inv_s + B.T @ Vxx @ B
        Qux = lux_t * inv_s + B.T @ Vxx @ A
        mu_eff = mu * inv_s
        if cfg.value_scaling:
            # once s dwarfs mu the true LM shift underflows in normalized
            # space; a machine-epsilon-relative floor keeps Quu_reg
            # factorizable without perturbing any ratio representable in
            # the working precision.  The floor is RELATIVE to ||Quu||
            # (round-5 fix): an absolute 10*eps floor against a
            # near-singular Quu produced K ~ Qux/eps ~ 1e6, whose
            # K^T Quu K overflowed f32 inside one step — see the
            # saturation note below
            mu_eff = mu_eff + (jnp.asarray(10.0, dt) * jnp.finfo(dt).eps
                               * jnp.maximum(jnp.max(jnp.abs(Quu)), 1.0))
        Quu_reg = Quu + mu_eff * jnp.eye(nu, dtype=dt)
        if cfg.control_limits:
            # control-limited step (Tassa/Mansard/Todorov ICRA 2014): k from
            # the boxQP over du in [lo-u*, hi-u*]; feedback only on the free
            # subspace (clamped controls get zero K rows via the masked
            # factor — ops/boxqp.py)
            qp = boxqp(Quu_reg, Qu, ulo - u_t, uhi - u_t,
                       jnp.zeros_like(u_t), iters=cfg.boxqp_iters)
            pd = qp.pd
            k = qp.x
            K = -linalg.cho_solve(
                qp.Lfree, jnp.where(qp.free[:, None], Qux, 0.0))
        else:
            # PD check via (pure-JAX) Cholesky; reuse factor for the solves
            L = linalg.cholesky(Quu_reg)
            pd = jnp.all(jnp.isfinite(L))
            Ls = jnp.where(pd, L, jnp.eye(nu, dtype=dt))
            K = -linalg.cho_solve(Ls, Qux)
            k = -linalg.cho_solve(Ls, Qu)
        Vx_n = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
        Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        # dV in TRUE units (s * normalized step terms); with scaling active
        # these diagnostics can saturate to inf in f32 — the gains cannot
        dV1 = dV1 + (k @ Qu) * jnp.exp(log_s)
        dV2 = dV2 + 0.5 * (k @ (Quu @ k)) * jnp.exp(log_s)
        if cfg.value_scaling:
            # saturate BEFORE rescaling: if the transport overflowed to inf
            # within this one step (giant gains against a stiff-contact A),
            # c = inf and Vxx/c = inf/inf = NaN — which then poisons every
            # earlier knot's gains (measured on the humanoid balance runs:
            # max|K| = NaN from the second MPC frame on).  Saturated
            # entries distort only steps the linesearch was going to
            # reject anyway; the carry stays finite so the solver can
            # recover when mu escalates.
            big = float(jnp.finfo(dt).max) / 16
            sat = lambda a: jnp.clip(jnp.nan_to_num(
                a, nan=0.0, posinf=big, neginf=-big), -big, big)
            Vx_n = sat(Vx_n)
            Vxx_n = sat(Vxx_n)
            c = jnp.maximum(jnp.max(jnp.abs(Vxx_n)), 1.0)
            Vx_n = Vx_n / c
            Vxx_n = Vxx_n / c
            log_s = log_s + jnp.log(c)
        return (Vx_n, Vxx_n, log_s, dV1, dV2, ok & pd), (K, k)

    xs = (lin.A[:N], lin.B[:N], lx[:N], lu[:N], lxx[:N], luu[:N], lux[:N],
          traj.ctrl[:N])
    init = (Vx0, Vxx0, jnp.zeros((), dt), jnp.zeros((), dt),
            jnp.zeros((), dt), jnp.asarray(True))
    (_, _, _, dV1, dV2, ok), (K, k) = jax.lax.scan(body, init, xs,
                                                   reverse=True)
    K = jnp.concatenate([K, jnp.zeros((1, nu, nv2), dt)])
    k = jnp.concatenate([k, jnp.zeros((1, nu), dt)])
    return K, k, dV1, dV2, ok


# ---------------------------------------------------------------------------
# associative-scan (parallel) Riccati backward pass
# ---------------------------------------------------------------------------

def _lqr_combine(e2, e1):
    """Associative combination of conditional-value-function elements.

    Element semantics (Särkkä & García-Fernández, temporal parallelization
    of LQT): E = (A, b, C, eta, J) represents the optimal cost of steering
    the LINEARIZED system from start state x to end state z,
        f(x, z) = 0.5 x^T J x - eta^T x
                  + max_lam [lam^T (z - A x - b) - 0.5 lam^T C lam],
    and f12(x, z) = min_y f1(x, y) + f2(y, z) has the same form with the
    closed-form parameters below (only (I + C1 J2) is inverted — always
    nonsingular for PSD C, J).  Combination is associative => the suffix
    value functions of the whole horizon come from one
    jax.lax.associative_scan in O(log N) depth.

    Argument order: lax.associative_scan(fn, elems, reverse=True) calls
    fn(later, earlier) elementwise-batched; we combine earlier∘later."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2

    def one(A1, b1, C1, eta1, J1, A2, b2, C2, eta2, J2):
        n = A1.shape[0]
        eye = jnp.eye(n, dtype=A1.dtype)
        # (I + C1 J2)^-1 via LU: PSD product is nonsymmetric
        M = eye + C1 @ J2
        Minv_A1 = jnp.linalg.solve(M, A1)
        Minv_bCeta = jnp.linalg.solve(M, b1 + C1 @ eta2)
        Nt = eye + J2 @ C1
        Ntinv_eta = jnp.linalg.solve(Nt, eta2 - J2 @ b1)
        Ntinv_JA = jnp.linalg.solve(Nt, J2 @ A1)
        return (A2 @ Minv_A1,
                A2 @ Minv_bCeta + b2,
                A2 @ jnp.linalg.solve(M, C1) @ A2.T + C2,
                A1.T @ Ntinv_eta + eta1,
                A1.T @ Ntinv_JA + J1)

    f = one
    for _ in range(A1.ndim - 2):
        f = jax.vmap(f)
    return f(A1, b1, C1, eta1, J1, A2, b2, C2, eta2, J2)


def backward_pass_assoc(model: Model, traj: State, lin: LinOut,
                        cost_fn: CostFn, mu, cfg: ILQRConfig):
    """Parallel (associative-scan) tassa backward pass.

    Equivalent to :func:`backward_pass_tassa` with the LM shift applied to
    every Quu (the sequential pass regularizes only the gain solves, so the
    two coincide exactly as mu -> 0 and agree to O(mu) otherwise).  Same
    return contract: (K, k, dV1, dV2, ok)."""
    N = cfg.horizon
    nv2, nu = 2 * model.nv, model.nu
    dt = lin.A.dtype
    lx, lu, lxx, luu, lux = _cost_quadratics(cost_fn, model, traj)

    A, B = lin.A[:N], lin.B[:N]
    P, p = lxx[:N], lx[:N]
    R = luu[:N] + mu * jnp.eye(nu, dtype=dt)[None]
    r, Mx = lu[:N], lux[:N]

    # stage elements: eliminate u from (cost, dynamics) — see _lqr_combine
    Rinv_Bt = jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))    # (N, nu, 2nv)
    Rinv_M = jnp.linalg.solve(R, Mx)                          # (N, nu, 2nv)
    Rinv_r = jnp.linalg.solve(R, r[..., None])[..., 0]        # (N, nu)
    eA = A - B @ Rinv_M
    eb = -(B @ Rinv_r[..., None])[..., 0]
    eC = B @ Rinv_Bt
    eJ = P - jnp.swapaxes(Mx, -1, -2) @ Rinv_M
    eeta = -(p - (jnp.swapaxes(Mx, -1, -2) @ Rinv_r[..., None])[..., 0])

    # terminal element encodes the terminal quadratic
    zA = jnp.zeros((1, nv2, nv2), dt)
    elems = (
        jnp.concatenate([eA, zA]),
        jnp.concatenate([eb, jnp.zeros((1, nv2), dt)]),
        jnp.concatenate([eC, zA]),
        jnp.concatenate([eeta, -lx[N][None]]),
        jnp.concatenate([eJ, lxx[N][None]]),
    )
    suffix = jax.lax.associative_scan(_lqr_combine, elems, reverse=True)
    # V_{t}(x) = 0.5 x^T J_t x - eta_t^T x; gains at t need (J, eta)_{t+1}
    Jn = suffix[4][1:]          # (N, 2nv, 2nv)
    etan = suffix[3][1:]        # (N, 2nv)

    def gains(A_t, B_t, lu_t, luu_t, lux_t, J1, eta1):
        Qu = lu_t + B_t.T @ (-eta1)
        Quu = luu_t + B_t.T @ J1 @ B_t
        Qux = lux_t + B_t.T @ J1 @ A_t
        Quu_reg = Quu + mu * jnp.eye(nu, dtype=dt)
        L = linalg.cholesky(Quu_reg)
        pd = jnp.all(jnp.isfinite(L))
        Ls = jnp.where(pd, L, jnp.eye(nu, dtype=dt))
        K = -linalg.cho_solve(Ls, Qux)
        k = -linalg.cho_solve(Ls, Qu)
        return K, k, k @ Qu, 0.5 * k @ (Quu @ k), pd

    K, k, dv1, dv2, pd = jax.vmap(gains)(A, B, lu[:N], luu[:N], lux[:N],
                                         Jn, etan)
    K = jnp.concatenate([K, jnp.zeros((1, nu, nv2), dt)])
    k = jnp.concatenate([k, jnp.zeros((1, nu), dt)])
    return K, k, jnp.sum(dv1), jnp.sum(dv2), jnp.all(pd)


# ---------------------------------------------------------------------------
# solve loops
# ---------------------------------------------------------------------------

def iterate_compat(model: Model, cost_fn: CostFn, x0: State,
                   sol: ILQRState, cfg: ILQRConfig):
    """One reference iteration (inc/ilqr.h:179-186): forward then backward."""
    traj = forward_pass(model, x0, sol, cfg)
    lin = linearize_traj(model, traj, cost_fn, cfg.lin)
    K, k = backward_pass_compat(model, traj, lin, cfg)
    cost = _traj_cost(cost_fn, traj)
    return ILQRState(traj=traj, K=K, k=k, mu=sol.mu), cost


def iterate_tassa(model: Model, cost_fn: CostFn, x0: State,
                  sol: ILQRState, cfg: ILQRConfig):
    """One modern iLQG iteration: linearize, regularized backward pass, and a
    *parallel* backtracking linesearch — every alpha rolled out concurrently
    by vmap (TPU-friendly: trades FLOPs for zero serial linesearch latency)."""
    lin = linearize_traj(model, sol.traj, cost_fn, cfg.lin)
    bwd = (backward_pass_assoc if cfg.backward == "assoc"
           else backward_pass_tassa)
    K, k, dV1, dV2, ok = bwd(model, sol.traj, lin, cost_fn, sol.mu, cfg)

    # Receding-horizon rebase (round-5 fix): the acceptance baseline is the
    # alpha=0 (feedback-only, k suppressed) rollout FROM THE CURRENT x0 —
    # not the cost of the stored trajectory.  Under MPC the stored
    # trajectory starts at the PREVIOUS frame's state; comparing fresh
    # candidates against that stale cost rejects every step whenever the
    # state has drifted somewhere genuinely worse (measured: the humanoid
    # balance runs applied |u| = 0 for 130 straight frames while the trace
    # sat frozen at the frame-0 rollout cost — a pure ballistic fall).
    # When x0 == traj[0] (plain solve) the alpha=0 rollout reproduces the
    # stored trajectory bit-exactly (x == x* along the path => u == u*), so
    # non-MPC behavior is unchanged.
    cand = ILQRState(traj=sol.traj, K=K, k=k, mu=sol.mu)
    alphas = jnp.concatenate([jnp.zeros((1,), sol.k.dtype),
                              jnp.asarray(cfg.alphas, sol.k.dtype)])
    trajs = jax.vmap(lambda a: forward_pass(model, x0, cand, cfg, alpha=a))(
        alphas)
    costs = jax.vmap(lambda t: _traj_cost(cost_fn, t))(trajs)
    # baseline: rebased rollout when finite, else the stale stored cost
    # (an unstable-feedback rebase must not poison the solver state)
    cost_stale = _traj_cost(cost_fn, sol.traj)
    rebase_ok = jnp.isfinite(costs[0])
    cost0 = jnp.where(rebase_ok, costs[0], cost_stale)
    best = jnp.argmin(costs[1:]) + 1
    improved = ok & (costs[best] < cost0)

    sel = jnp.where(improved, best, jnp.where(rebase_ok, 0, -1))

    def pick(cands, old):
        keep = jnp.broadcast_to(old, cands[0].shape)
        return jnp.where(sel >= 0, cands[jnp.maximum(sel, 0)], keep)

    new_traj = jax.tree_util.tree_map(pick, trajs, sol.traj)
    mu_new = jnp.where(
        improved,
        jnp.maximum(sol.mu / cfg.mu_factor, cfg.mu_min),
        jnp.minimum(sol.mu * cfg.mu_factor ** 2, cfg.mu_max))
    new_cost = jnp.where(improved, costs[best], cost0)
    return (ILQRState(traj=new_traj, K=K, k=k, mu=mu_new), new_cost)


def solve(model: Model, cost_fn: CostFn, x0: State, sol: ILQRState,
          cfg: ILQRConfig):
    """Run cfg.iterations iLQR iterations from x0 (the reference's
    `for i<maxIterUtilConvergence: iterate()` loop,
    src/inverted_pendulum/inverted_pendulum.cpp:22-23).

    Returns (solver state, per-iteration cost trace) — the cost trace is the
    golden artifact the reference never logs (SURVEY.md §5 metrics row)."""
    it = iterate_compat if cfg.mode == "compat" else iterate_tassa

    def body(s, _):
        s2, cost = it(model, cost_fn, x0, s, cfg)
        return s2, cost

    return jax.lax.scan(body, sol, None, length=cfg.iterations)
