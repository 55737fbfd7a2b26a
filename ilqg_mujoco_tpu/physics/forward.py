"""Forward dynamics + integrators: the mj_forward / mj_step analogs.

Pure functions of (Model, State); everything jits, vmaps and differentiates.
The pipeline is decomposed into explicit stages mirroring mj_forwardSkip's
skip classes (/root/reference/src/mjderivative.cpp:92,124,178):

* :func:`pos_stage`   — kinematics, mass matrix + factor, collision,
  position-stage constraint assembly (what mjSTAGE_POS skips recomputing);
* :func:`vel_stage`   — bias/passive forces and the constraint aref
  (what mjSTAGE_VEL skips);
* :func:`acc_stage`   — actuation, applied forces, smooth acceleration and
  the constraint solve.

The FD linearizer evaluates only the stages a perturbation class invalidates
(ctrl -> acc only; qvel -> vel+acc; qpos -> all), exactly like the
reference's per-class forwardSkip calls — XLA does NOT deduplicate shared
stage work across vmap lanes, so the split is done here, not left to the
compiler.  The AD engine gets the same economy for free from symbolic-zero
tangent pruning in forward-mode JVP rules.

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


class PosStage(NamedTuple):
    """Position-stage products (functions of qpos only)."""
    kin: smooth.KinOut
    Mfac: jnp.ndarray
    contacts: collision.Contacts
    efc_pos: constraint.EfcPos


class VelStage(NamedTuple):
    """Velocity-stage products (functions of qpos, qvel)."""
    qfrc_bias: jnp.ndarray
    qfrc_passive: jnp.ndarray
    aref: jnp.ndarray


def pos_stage(model: Model, qpos: jnp.ndarray) -> PosStage:
    """Everything that depends on qpos only: kinematics, M + Cholesky factor,
    collision, position-stage constraint rows."""
    from ..ops import linalg
    kin = smooth.kinematics(model, qpos)
    Mfac = linalg.cholesky(kin.M)
    contacts = collision.collide(model, kin.geom_xpos, kin.geom_xmat)
    efc_pos = constraint.make_efc_pos(model, kin, qpos, contacts)
    return PosStage(kin=kin, Mfac=Mfac, contacts=contacts, efc_pos=efc_pos)


def vel_stage(model: Model, pos: PosStage, qpos: jnp.ndarray,
              qvel: jnp.ndarray) -> VelStage:
    """Everything invalidated by a qvel change (given pos-stage products)."""
    return VelStage(
        qfrc_bias=smooth.bias_force(model, pos.kin, qvel),
        qfrc_passive=smooth.passive_force(model, qpos, qvel),
        aref=pos.efc_pos.aref_of(qvel))


def acc_stage(model: Model, pos: PosStage, vel: VelStage, ctrl: jnp.ndarray,
              qfrc_applied: jnp.ndarray, xfrc_applied: jnp.ndarray,
              qacc_warmstart: jnp.ndarray, iterations: int, tolerance: float):
    """Actuation + smooth acceleration + constraint solve -> (qacc, aux
    pieces).  The only stage a ctrl perturbation needs to re-run."""
    from ..ops import linalg
    qfrc_actuator = smooth.actuator_force(model, ctrl)
    qfrc_smooth = (vel.qfrc_passive + qfrc_actuator - vel.qfrc_bias
                   + smooth.applied_force(model, pos.kin, qfrc_applied,
                                          xfrc_applied))
    qacc_smooth = linalg.cho_solve(pos.Mfac, qfrc_smooth)
    efc = constraint.Efc(J=pos.efc_pos.J, D=pos.efc_pos.D, aref=vel.aref,
                         pos=pos.efc_pos.pos)
    out = solver.solve(pos.kin.M, pos.Mfac, qacc_smooth, efc,
                       qacc_warmstart, iterations, tolerance,
                       ls_iterations=min(model.opt.ls_iterations, 16))
    return qfrc_smooth, qacc_smooth, efc, out


def forward_full(model: Model, state: State,
                 iterations: Optional[int] = None,
                 tolerance: Optional[float] = None):
    """mj_forward: full pipeline -> (state with qacc/warmstart updated, aux).

    ``iterations``/``tolerance`` override the model options — the FD pinning
    hook (reference pins to 30/0 during finite differencing)."""
    it = model.opt.iterations if iterations is None else iterations
    tol = model.opt.tolerance if tolerance is None else tolerance

    pos = pos_stage(model, state.qpos)
    vel = vel_stage(model, pos, state.qpos, state.qvel)
    qfrc_smooth, qacc_smooth, efc, out = acc_stage(
        model, pos, vel, state.ctrl, state.qfrc_applied, state.xfrc_applied,
        state.qacc_warmstart, it, tol)
    new_state = state.replace(qacc=out.qacc, qacc_warmstart=out.qacc)
    aux = ForwardAux(pos.kin, qfrc_smooth, qacc_smooth, out.qfrc_constraint,
                     efc, pos.contacts, out.niter)
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
