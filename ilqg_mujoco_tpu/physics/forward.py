"""Forward dynamics + integrators: the mj_forward / mj_step analogs.

Pure functions of (Model, State); everything jits, vmaps and differentiates.
``forward`` is the exact semantic analog of the reference's pinned
``mj_forwardSkip`` protocol (/root/reference/src/mjderivative.cpp:64-68,
92,124,178): because the pipeline is *pure*, the skip-stage machinery is
unnecessary — a perturbed evaluation that only changes ctrl simply reuses the
same traced graph, and XLA CSEs shared position-stage work across the
batched-perturbation axis of the FD linearizer.

Integrators: MuJoCo 'Euler' (semi-implicit, implicit joint damping) and 'RK4'
(classic 4-stage on the qpos manifold).  Both reference models are covered:
pendulum is RK4/dt=0.02 (/root/reference/res/inverted_pendulum.xml:9), hopper
Euler/dt=0.002 (/root/reference/res/hopper.xml:8).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import collision, constraint, smooth, solver, spatial
from .model import (INT_RK4, JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model,
                    State)


class ForwardAux(NamedTuple):
    kin: smooth.KinOut
    qfrc_smooth: jnp.ndarray
    qacc_smooth: jnp.ndarray
    qfrc_constraint: jnp.ndarray
    efc: constraint.Efc
    contacts: collision.Contacts
    solver_niter: jnp.ndarray


def forward_full(model: Model, state: State,
                 iterations: Optional[int] = None,
                 tolerance: Optional[float] = None):
    """mj_forward: full pipeline -> (state with qacc/warmstart updated, aux).

    ``iterations``/``tolerance`` override the model options — the FD pinning
    hook (reference pins to 30/0 during finite differencing)."""
    it = model.opt.iterations if iterations is None else iterations
    tol = model.opt.tolerance if tolerance is None else tolerance

    kin, qfrc_smooth, qacc_smooth, Mfac = smooth.smooth_dynamics(
        model, state.qpos, state.qvel, state.ctrl,
        state.qfrc_applied, state.xfrc_applied)
    contacts = collision.collide(model, kin.geom_xpos, kin.geom_xmat)
    efc = constraint.make_efc(model, kin, state.qpos, state.qvel, contacts)
    out = solver.solve(kin.M, Mfac, qacc_smooth, efc,
                       state.qacc_warmstart, it, tol,
                       ls_iterations=min(model.opt.ls_iterations, 16))
    new_state = state.replace(qacc=out.qacc, qacc_warmstart=out.qacc)
    aux = ForwardAux(kin, qfrc_smooth, qacc_smooth, out.qfrc_constraint,
                     efc, contacts, out.niter)
    return new_state, aux


def forward(model: Model, state: State, iterations: Optional[int] = None,
            tolerance: Optional[float] = None) -> State:
    return forward_full(model, state, iterations, tolerance)[0]


def integrate_pos(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray,
                  h) -> jnp.ndarray:
    """mj_integratePos: joint-type-aware configuration update (quaternion
    exponential for ball/free — the same map the reference FD uses for
    quaternion-aware perturbations via mju_quatIntegrate,
    /root/reference/src/mjderivative.cpp:163-171)."""
    out = qpos
    for j in range(model.njnt):
        jt = int(model.jnt_type[j])
        qadr, dadr = int(model.jnt_qposadr[j]), int(model.jnt_dofadr[j])
        if jt in (JNT_SLIDE, JNT_HINGE):
            out = out.at[qadr].add(h * qvel[dadr])
        elif jt == JNT_BALL:
            q = spatial.quat_integrate(qpos[qadr:qadr + 4],
                                       qvel[dadr:dadr + 3], h)
            out = jax.lax.dynamic_update_slice(out, q, (qadr,))
        elif jt == JNT_FREE:
            out = jax.lax.dynamic_update_slice(
                out, qpos[qadr:qadr + 3] + h * qvel[dadr:dadr + 3], (qadr,))
            q = spatial.quat_integrate(qpos[qadr + 3:qadr + 7],
                                       qvel[dadr + 3:dadr + 6], h)
            out = jax.lax.dynamic_update_slice(out, q, (qadr + 3,))
    return out


def _euler(model: Model, state: State, aux: ForwardAux) -> State:
    """Semi-implicit Euler with implicit joint damping (mj_Euler)."""
    h = model.opt.timestep
    qacc = state.qacc
    if (not model.opt.disable_eulerdamp) and float(
            model.dof_damping.sum()) > 0:
        from ..ops import linalg
        MhB = aux.kin.M + h * jnp.diag(
            jnp.asarray(model.dof_damping, qacc.dtype))
        qfrc = aux.qfrc_smooth + aux.qfrc_constraint
        qacc = linalg.solve_psd(MhB, qfrc)
    qvel = state.qvel + h * qacc
    qpos = integrate_pos(model, state.qpos, qvel, h)
    return state.replace(time=state.time + h, qpos=qpos, qvel=qvel)


_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6)


def _rk4(model: Model, state: State, iterations, tolerance) -> State:
    """Classic RK4 on the qpos manifold (mj_RungeKutta(4))."""
    h = model.opt.timestep
    qpos0, qvel0 = state.qpos, state.qvel
    # stage 1 uses the already-forwarded qacc
    Fq = [state.qvel]
    Fv = [state.qacc]
    s = state
    for i in range(3):
        dqv = sum(a * f for a, f in zip(_RK4_A[i], Fq) if a != 0)
        dqa = sum(a * f for a, f in zip(_RK4_A[i], Fv) if a != 0)
        qpos_i = integrate_pos(model, qpos0, dqv, h)
        qvel_i = qvel0 + h * dqa
        s = s.replace(qpos=qpos_i, qvel=qvel_i)
        s = forward(model, s, iterations, tolerance)
        Fq.append(s.qvel)
        Fv.append(s.qacc)
    dqv = sum(b * f for b, f in zip(_RK4_B, Fq))
    dqa = sum(b * f for b, f in zip(_RK4_B, Fv))
    qpos = integrate_pos(model, qpos0, dqv, h)
    qvel = qvel0 + h * dqa
    return state.replace(time=state.time + h, qpos=qpos, qvel=qvel,
                         qacc_warmstart=s.qacc_warmstart)


def step(model: Model, state: State, iterations: Optional[int] = None,
         tolerance: Optional[float] = None) -> State:
    """mj_step: forward + integrate.  Pure, jit/vmap/grad-friendly."""
    st, aux = forward_full(model, state, iterations, tolerance)
    if model.opt.integrator == INT_RK4:
        return _rk4(model, st, iterations, tolerance)
    return _euler(model, st, aux)
