"""Batched linearization of the dynamics: the TPU-native replacement for the
reference's OpenMP finite-difference engine
(/root/reference/src/mjderivative.cpp).

The reference fans a thread pool out over the nv derivative columns, each
thread finite-differencing `qacc` with a pinned solver and shared-center
warmstart (worker(), src/mjderivative.cpp:43-209).  Here the same protocol is
a *single* ``vmap`` over all 2*(2nv+nu) signed perturbations — and a second
vmap over all N+1 trajectory knots — so one batched XLA computation replaces
the whole thread pool AND the per-knot loop interleaved into the reference's
backward pass (inc/ilqr.h:153-154).

Two engines:

* :func:`linearize_fd` — reference-exact central differences: quaternion-
  aware qpos perturbation (mju_quatIntegrate semantics,
  src/mjderivative.cpp:163-171), pinned solver (iterations=30, tolerance=0,
  :241-242), warmstart protocol (nwarmup center repetitions :66-68, restore
  before each perturbed eval :91,102,...), one-sided cost gradients
  (:88,120,174).
* :func:`linearize_ad` — forward-mode autodiff through the (pinned,
  differentiable) pipeline: exact qacc Jacobians, no epsilon, Euler-assembled
  like the reference.
* :func:`linearize_exact` — forward-mode autodiff of the FULL discrete step
  map x' = step(x, u): exact discrete-time (A, B) for ANY integrator.  The
  reference (and the 'fd'/'ad' engines) assemble A, B by explicit-Euler
  discretization of the qacc Jacobians (inc/differentiator.h:89-92) even when
  the model integrates RK4 (res/inverted_pendulum.xml:9 — SURVEY.md §7.0.9);
  that O(h^2) model error caps how far the solver can descend (observed: the
  T=100 pendulum stalls because predicted descent directions stop being
  descent directions).  'exact' removes the cap.

Both produce Euler-discretized (A, B) like Differentiator::updateDerivatives
(inc/differentiator.h:85-93):
    A = [[I, h I], [h Jq, I + h Jv]],   B = [[0], [h Ju]]
with an optional ``compat_transpose_A`` flag reproducing the reference's
transposed-Jacobian quirk (column-major Eigen maps over row-major FD writes —
SURVEY.md §7.0.1) for golden-trace matching.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..physics import forward as fwd
from ..physics import smooth, spatial
from ..physics.model import (JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model,
                             State)

# cost signature: cost(qpos, qvel, ctrl) -> scalar  (the stepCostFn_t
# contract, /root/reference/inc/mjderivative.h:5 — a scalar function of the
# dynamic state)
CostFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class LinearizeConfig:
    """FD knobs with the reference's exact defaults
    (/root/reference/src/mjderivative.cpp:36-39)."""
    eps: float = 1e-6
    niter: int = 30          # pinned solver iterations
    nwarmup: int = 3         # center-point repetitions
    compat_transpose_A: bool = False
    # reference quirk #2 (SURVEY.md §7.0.1): the FD worker writes the ctrl
    # Jacobian row-major, deriv[i + j*nu] = dqacc_j/dctrl_i
    # (src/mjderivative.cpp:107), but the Eigen Map<Matrix<nv,nu>> reading it
    # back is column-major (inc/differentiator.h:22,59) — a no-op for nu=1
    # (pendulum, the only shipped env) but an index SCRAMBLE for 1<nu<nv
    # (hopper, humanoid).  This flag reproduces the scrambled layout
    # bit-for-bit so compat mode matches the reference binary's literal
    # behavior on nu>1 models; leave False for the corrected algorithm.
    compat_scramble_B: bool = False
    # 'fd' (reference-exact) | 'ad' (AD of qacc, Euler-assembled like the
    # reference) | 'exact' (AD of the full discrete step: correct for RK4)
    engine: str = "fd"
    # stage-split FD (the mj_forwardSkip economy,
    # src/mjderivative.cpp:92,124,178): evaluate only the pipeline stages a
    # perturbation class invalidates.  False = monolithic full-pipeline evals
    # (round-1 behavior, kept for A/B benchmarking).
    stage_split: bool = True
    # knots linearized concurrently by linearize_traj: None = all at once
    # (fastest), k = sequential lax.map over ceil(T/k) chunks of k (peak
    # memory / (T/k) — needed for 4096-instance batches where the whole-
    # horizon tangent intermediates exceed HBM)
    chunk_knots: int = None

    def __post_init__(self):
        if self.engine not in ("fd", "ad", "exact"):
            raise ValueError(f"unknown linearize engine {self.engine!r}")
        if self.engine == "exact" and (self.compat_transpose_A
                                       or self.compat_scramble_B):
            # the compat flags reproduce the reference's Euler-ASSEMBLY
            # buffer quirks (SURVEY.md §7.0.1); linearize_exact has no Euler
            # assembly, so the flags would be a silent no-op — refuse loudly
            # (mirrors ILQRConfig.__post_init__'s combination guards)
            raise ValueError(
                "compat_transpose_A/compat_scramble_B have no effect with "
                "engine='exact' (no Euler assembly to transpose/scramble); "
                "use engine='fd' or 'ad' for compat-layout linearization")


class LinOut(NamedTuple):
    A: jnp.ndarray      # (..., 2nv, 2nv)
    B: jnp.ndarray      # (..., 2nv, nu)
    gx: jnp.ndarray     # (..., 2nv)   cost gradient wrt [dqpos_tangent; qvel]
    gu: jnp.ndarray     # (..., nu)
    cost: jnp.ndarray   # (...)        center step cost


def _perturb_qpos(model: Model, qpos: jnp.ndarray, dof: int, eps):
    """Quaternion-aware qpos perturbation along tangent direction `dof`
    (the reference's ball/free handling, src/mjderivative.cpp:148-171)."""
    j = int(model.dof_jntid[dof])
    jt = int(model.jnt_type[j])
    qadr = int(model.jnt_qposadr[j])
    dadr = int(model.jnt_dofadr[j])
    k = dof - dadr
    if jt in (JNT_SLIDE, JNT_HINGE):
        return qpos.at[qadr].add(eps)
    if jt == JNT_BALL:
        vel = jnp.zeros(3, qpos.dtype).at[k].set(eps)
        q = spatial.quat_integrate(qpos[qadr:qadr + 4], vel, 1.0)
        return jax.lax.dynamic_update_slice(qpos, q, (qadr,))
    # free joint: first 3 dofs translate, last 3 rotate the quaternion
    if k < 3:
        return qpos.at[qadr + k].add(eps)
    vel = jnp.zeros(3, qpos.dtype).at[k - 3].set(eps)
    q = spatial.quat_integrate(qpos[qadr + 3:qadr + 7], vel, 1.0)
    return jax.lax.dynamic_update_slice(qpos, q, (qadr + 3,))


def _center(model: Model, state: State, cfg: LinearizeConfig) -> State:
    """Warmed center evaluation, replicating the reference's skip-stage
    warmup economy literally (src/mjderivative.cpp:64-68): one full
    ``mj_forward``, then (nwarmup-1) acc-stage-only repetitions — the
    ``mj_forwardSkip(mjSTAGE_VEL)`` analog — chaining ``qacc_warmstart``
    through the pinned solver.

    Position/velocity stages are pure functions of (qpos, qvel), which the
    warmup does not change, so re-running them (the rounds-1..4 behavior:
    nwarmup *full* forwards) is bit-identical in output; this form also
    skips them, matching the reference's cost profile on the warmup path
    itself.  Equivalence is asserted by
    tests/test_linearize.py::test_center_warmup_skip_equivalence."""
    s = fwd.forward(model, state, iterations=cfg.niter, tolerance=0.0)
    if cfg.nwarmup <= 1:
        return s
    pos = fwd.pos_stage(model, state.qpos)
    vel = fwd.vel_stage(model, pos, state.qpos, state.qvel)
    for _ in range(cfg.nwarmup - 1):
        _, _, _, out = fwd.acc_stage(
            model, pos, vel, state.ctrl, state.qfrc_applied,
            state.xfrc_applied, s.qacc_warmstart, cfg.niter, 0.0)
        s = s.replace(qacc=out.qacc, qacc_warmstart=out.qacc)
    return s


def scramble_B(Ju: jnp.ndarray) -> jnp.ndarray:
    """The reference's 1<nu<nv ctrl-Jacobian layout bug, exactly.

    The flat FD buffer holds flat[i + j*nu] = Ju[j, i]
    (src/mjderivative.cpp:107); the column-major Map<Matrix<nv,nu>> reads
    element (a, b) from flat[a + b*nv] (inc/differentiator.h:22,59).  So the
    matrix the reference's recursion actually consumes is the row-major
    flattening of the true Jacobian re-read column-major — identity for
    nu=1, garbage (but deterministic, reproducible garbage) otherwise."""
    nv, nu = Ju.shape
    return Ju.reshape(-1).reshape(nu, nv).T


def _assemble(model: Model, Jq, Jv, Ju, cfg: LinearizeConfig):
    """Euler discretization (inc/differentiator.h:68-71, 89-92)."""
    h = model.opt.timestep
    nv, nu = model.nv, model.nu
    dt = Jq.dtype
    if cfg.compat_transpose_A:
        # reference quirk: column-major Eigen maps over row-major FD writes
        # transpose the qpos/qvel blocks (SURVEY.md §7.0.1)
        Jq, Jv = Jq.T, Jv.T
    if cfg.compat_scramble_B:
        Ju = scramble_B(Ju)
    eye = jnp.eye(nv, dtype=dt)
    A = jnp.block([[eye, h * eye],
                   [h * Jq, eye + h * Jv]])
    B = jnp.concatenate([jnp.zeros((nv, nu), dt), h * Ju], axis=0)
    return A, B


def linearize_fd(model: Model, state: State, cost_fn: CostFn,
                 cfg: LinearizeConfig = LinearizeConfig()) -> LinOut:
    """Reference-exact FD linearization at a single knot.

    vmap this over a stacked trajectory State to linearize a whole horizon in
    one batched pass (the restructuring SURVEY.md §3.3 calls out)."""
    nv, nu = model.nv, model.nu
    dt = state.qpos.dtype
    eps = jnp.asarray(cfg.eps, dt)

    sc = _center(model, state, cfg)
    warm = sc.qacc_warmstart
    cost0 = cost_fn(state.qpos, state.qvel, state.ctrl)

    # perturbation batches: [qpos+|-], [qvel+|-], [ctrl+|-]
    qpos_p, qpos_m = [], []
    for i in range(nv):
        qpos_p.append(_perturb_qpos(model, state.qpos, i, eps))
        qpos_m.append(_perturb_qpos(model, state.qpos, i, -eps))
    qpos_pert = jnp.stack(qpos_p + qpos_m)              # (2nv, nq)
    eyev = jnp.eye(nv, dtype=dt)
    qvel_pert = jnp.concatenate([state.qvel + eps * eyev,
                                 state.qvel - eps * eyev])  # (2nv, nv)
    eyeu = jnp.eye(nu, dtype=dt)
    ctrl_pert = jnp.concatenate([state.ctrl + eps * eyeu,
                                 state.ctrl - eps * eyeu])  # (2nu, nu)

    def acc_of(pos, vel, ctrl):
        _, _, _, out = fwd.acc_stage(
            model, pos, vel, ctrl, state.qfrc_applied, state.xfrc_applied,
            warm, cfg.niter, 0.0)
        return out.qacc

    if cfg.stage_split:
        # per-class stage reuse (mjSTAGE_NONE / POS / VEL analogs)
        def eval_qpos(qpos):
            pos = fwd.pos_stage(model, qpos)
            vel = fwd.vel_stage(model, pos, qpos, state.qvel)
            return acc_of(pos, vel, state.ctrl)

        pos_c = fwd.pos_stage(model, state.qpos)
        vel_c = fwd.vel_stage(model, pos_c, state.qpos, state.qvel)

        def eval_qvel(qvel):
            vel = fwd.vel_stage(model, pos_c, state.qpos, qvel)
            return acc_of(pos_c, vel, state.ctrl)

        def eval_ctrl(ctrl):
            return acc_of(pos_c, vel_c, ctrl)

        qacc_q = jax.vmap(eval_qpos)(qpos_pert)         # (2nv, nv)
        qacc_v = jax.vmap(eval_qvel)(qvel_pert)         # (2nv, nv)
        qacc_u = jax.vmap(eval_ctrl)(ctrl_pert)         # (2nu, nv)
    else:
        # monolithic full-pipeline evals (round-1 behavior, for A/B)
        def eval_qacc(qpos, qvel, ctrl):
            s = state.replace(qpos=qpos, qvel=qvel, ctrl=ctrl,
                              qacc_warmstart=warm)
            return fwd.forward(model, s, iterations=cfg.niter,
                               tolerance=0.0).qacc

        qpos_b = jnp.concatenate([
            qpos_pert,
            jnp.broadcast_to(state.qpos, (2 * nv + 2 * nu, model.nq))])
        qvel_b = jnp.concatenate([
            jnp.broadcast_to(state.qvel, (2 * nv, nv)), qvel_pert,
            jnp.broadcast_to(state.qvel, (2 * nu, nv))])
        ctrl_b = jnp.concatenate([
            jnp.broadcast_to(state.ctrl, (4 * nv, nu)), ctrl_pert])
        qacc_b = jax.vmap(eval_qacc)(qpos_b, qvel_b, ctrl_b)
        qacc_q = qacc_b[0:2 * nv]
        qacc_v = qacc_b[2 * nv:4 * nv]
        qacc_u = qacc_b[4 * nv:]

    inv2eps = 1.0 / (2.0 * eps)
    Jq = (qacc_q[:nv] - qacc_q[nv:]).T * inv2eps                  # (nv,nv)
    Jv = (qacc_v[:nv] - qacc_v[nv:]).T * inv2eps
    Ju = (qacc_u[:nu] - qacc_u[nu:]).T * inv2eps                  # (nv,nu)

    # one-sided cost gradients at the +eps states (reference protocol:
    # forward difference, no dynamics eval needed — cost is state-local)
    cost_qpos = jax.vmap(lambda qp: cost_fn(qp, state.qvel, state.ctrl))(
        qpos_pert[:nv])
    cost_qvel = jax.vmap(lambda qv: cost_fn(state.qpos, qv, state.ctrl))(
        qvel_pert[:nv])
    cost_ctrl = jax.vmap(lambda u: cost_fn(state.qpos, state.qvel, u))(
        ctrl_pert[:nu])
    gx = jnp.concatenate([(cost_qpos - cost0), (cost_qvel - cost0)]) / eps
    gu = (cost_ctrl - cost0) / eps

    A, B = _assemble(model, Jq, Jv, Ju, cfg)
    return LinOut(A=A, B=B, gx=gx, gu=gu, cost=cost0)


def linearize_ad(model: Model, state: State, cost_fn: CostFn,
                 cfg: LinearizeConfig = LinearizeConfig()) -> LinOut:
    """Forward-mode autodiff linearization: exact Jacobians of the pinned
    pipeline, exact cost gradients.  Same output contract as linearize_fd."""
    nv, nu = model.nv, model.nu
    sc = _center(model, state, cfg)
    warm = sc.qacc_warmstart

    def qacc_of(dq, dv, du):
        qpos = fwd.integrate_pos(model, state.qpos, dq, 1.0)
        s = state.replace(qpos=qpos, qvel=state.qvel + dv,
                          ctrl=state.ctrl + du, qacc_warmstart=warm)
        return fwd.forward(model, s, iterations=cfg.niter,
                           tolerance=0.0).qacc

    z_v = jnp.zeros(nv, state.qpos.dtype)
    z_u = jnp.zeros(nu, state.qpos.dtype)
    Jq = jax.jacfwd(lambda d: qacc_of(d, z_v, z_u))(z_v)
    Jv = jax.jacfwd(lambda d: qacc_of(z_v, d, z_u))(z_v)
    Ju = jax.jacfwd(lambda d: qacc_of(z_v, z_v, d))(z_u)

    def cost_of(dq, dv, du):
        qpos = fwd.integrate_pos(model, state.qpos, dq, 1.0)
        return cost_fn(qpos, state.qvel + dv, state.ctrl + du)

    gq = jax.grad(lambda d: cost_of(d, z_v, z_u))(z_v)
    gv = jax.grad(lambda d: cost_of(z_v, d, z_u))(z_v)
    gu = jax.grad(lambda d: cost_of(z_v, z_v, d))(z_u)
    cost0 = cost_fn(state.qpos, state.qvel, state.ctrl)

    A, B = _assemble(model, Jq, Jv, Ju, cfg)
    return LinOut(A=A, B=B, gx=jnp.concatenate([gq, gv]), gu=gu, cost=cost0)


def _qpos_diff(model: Model, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Tangent-space configuration difference a ominus b in R^{nv}
    (quaternion log map for ball/free joints)."""
    if model.nq == model.nv:
        return a - b
    parts = []
    for j in range(model.njnt):
        jt = int(model.jnt_type[j])
        qadr = int(model.jnt_qposadr[j])
        if jt in (JNT_SLIDE, JNT_HINGE):
            parts.append(a[qadr:qadr + 1] - b[qadr:qadr + 1])
        elif jt == JNT_BALL:
            parts.append(spatial.quat_sub(a[qadr:qadr + 4],
                                          b[qadr:qadr + 4]))
        elif jt == JNT_FREE:
            parts.append(a[qadr:qadr + 3] - b[qadr:qadr + 3])
            parts.append(spatial.quat_sub(a[qadr + 3:qadr + 7],
                                          b[qadr + 3:qadr + 7]))
    return jnp.concatenate(parts)


def linearize_exact(model: Model, state: State, cost_fn: CostFn,
                    cfg: LinearizeConfig = LinearizeConfig()) -> LinOut:
    """Exact discrete-time linearization: A = dx'/dx, B = dx'/du of the full
    step map (integrator included) via forward-mode AD, in tangent-space
    coordinates.  Output tangents are taken at the center's true next state,
    so A, B are exactly the Jacobians the Riccati recursion assumes when the
    trajectory is dynamically consistent.

    ``compat_transpose_A`` does not apply here (there is no Euler assembly to
    transpose); the flag is ignored."""
    nv, nu = model.nv, model.nu
    sc = _center(model, state, cfg)
    warm = sc.qacc_warmstart

    next0 = fwd.step(model, state.replace(qacc_warmstart=warm),
                     iterations=cfg.niter, tolerance=0.0)
    next0 = jax.lax.stop_gradient(next0)

    def next_tangent(dq, dv, du):
        qpos = fwd.integrate_pos(model, state.qpos, dq, 1.0)
        s = state.replace(qpos=qpos, qvel=state.qvel + dv,
                          ctrl=state.ctrl + du, qacc_warmstart=warm)
        s2 = fwd.step(model, s, iterations=cfg.niter, tolerance=0.0)
        return jnp.concatenate([_qpos_diff(model, s2.qpos, next0.qpos),
                                s2.qvel - next0.qvel])

    z_x = jnp.zeros(2 * nv, state.qpos.dtype)
    z_u = jnp.zeros(nu, state.qpos.dtype)
    A = jax.jacfwd(lambda dx: next_tangent(dx[:nv], dx[nv:], z_u))(z_x)
    B = jax.jacfwd(lambda du: next_tangent(z_x[:nv], z_x[nv:], du))(z_u)

    def cost_of(dq, dv, du):
        qpos = fwd.integrate_pos(model, state.qpos, dq, 1.0)
        return cost_fn(qpos, state.qvel + dv, state.ctrl + du)

    z_v = jnp.zeros(nv, state.qpos.dtype)
    gq = jax.grad(lambda d: cost_of(d, z_v, z_u))(z_v)
    gv = jax.grad(lambda d: cost_of(z_v, d, z_u))(z_v)
    gu = jax.grad(lambda d: cost_of(z_v, z_v, d))(z_u)
    cost0 = cost_fn(state.qpos, state.qvel, state.ctrl)
    return LinOut(A=A, B=B, gx=jnp.concatenate([gq, gv]), gu=gu, cost=cost0)


_ENGINES = {"fd": linearize_fd, "ad": linearize_ad, "exact": linearize_exact}


def linearize_traj(model: Model, states: State, cost_fn: CostFn,
                   cfg: LinearizeConfig = LinearizeConfig()) -> LinOut:
    """Linearize every knot of a stacked trajectory State in one batched
    pass: vmap over knots x (vmap over perturbations) — this single call
    replaces the reference's N+1 serialized calcMJDerivatives invocations
    inside the backward loop (inc/ilqr.h:153-154)."""
    fn = _ENGINES[cfg.engine]
    f = lambda s: fn(model, s, cost_fn, cfg)
    if cfg.chunk_knots is None:
        return jax.vmap(f)(states)
    T = states.qpos.shape[0]
    c = cfg.chunk_knots
    nchunk = -(-T // c)
    pad = nchunk * c - T
    tm = jax.tree_util.tree_map
    padded = tm(
        lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
        if pad else a, states)
    chunked = tm(lambda a: a.reshape((nchunk, c) + a.shape[1:]), padded)
    out = jax.lax.map(jax.vmap(f), chunked)
    return tm(lambda a: a.reshape((nchunk * c,) + a.shape[2:])[:T], out)
