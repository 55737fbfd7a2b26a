"""Smooth (unconstrained) forward dynamics: kinematics, mass matrix, bias
forces, passive forces, actuation.

TPU-first design
----------------
MuJoCo's C core computes the mass matrix with a Composite-Rigid-Body tree
recursion and the bias force with a two-sweep RNE — inherently sequential.
Here both are reformulated as *dense masked einsums* over (bodies x dofs)
using precomputed ancestor masks (Model.dof_mask), so the whole pipeline is a
handful of batched matmuls/outer products that XLA tiles onto the MXU/VPU and
that vmap cleanly over perturbations, knots and problem instances — the
batched-FD linearizer (replacing the OpenMP worker pool of
/root/reference/src/mjderivative.cpp:43-209) and the batched MPC layer both
ride this.

Math conventions: angular-first Plücker vectors at the world origin (see
spatial.py).  All functions are pure; Model is a host-side constant closed
over at trace time so XLA constant-folds every model parameter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spatial
from .model import (JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model, State)


class KinOut(NamedTuple):
    """Position-stage quantities (mj_fwdPosition analog)."""
    xpos: jnp.ndarray      # (nbody,3) body frame origin, world
    xquat: jnp.ndarray     # (nbody,4)
    xmat: jnp.ndarray      # (nbody,3,3)
    xipos: jnp.ndarray     # (nbody,3) body com, world
    ximat: jnp.ndarray     # (nbody,3,3) inertial frame, world
    xanchor: jnp.ndarray   # (njnt,3)
    xaxis: jnp.ndarray     # (njnt,3)
    S: jnp.ndarray         # (nv,6) dof motion axes, world-origin Plücker
    inertia: jnp.ndarray   # (nbody,6,6) spatial inertia, world-origin Plücker
    M: jnp.ndarray         # (nv,nv) joint-space inertia matrix (with armature)
    geom_xpos: jnp.ndarray  # (ngeom,3)
    geom_xmat: jnp.ndarray  # (ngeom,3,3)


def _dof_prefix_mask(model: Model) -> np.ndarray:
    """DM[i, j] = 1 iff dof j moves the line that dof i's screw axis is
    rigidly attached to, so that Sdot_i = (sum_j DM[i,j] S_j qvel_j) x S_i.

    Rules (axis-line attachment):
      * free-joint translation dofs: axes are world-fixed -> row of zeros;
      * all other dofs (hinge/slide/ball/free-rotation): the axis line is
        attached to the frame after the joint -> include dofs on strict
        ancestor bodies and same-body joints with jnt(j) <= jnt(i).
        Including the own joint is exact: its self-contribution
        (S qd) x (S qd) vanishes when summed over the joint's dofs."""
    nv = model.nv
    dm = np.zeros((nv, nv))
    for i in range(nv):
        bi, ji = int(model.dof_bodyid[i]), int(model.dof_jntid[i])
        if (int(model.jnt_type[ji]) == JNT_FREE
                and i - int(model.jnt_dofadr[ji]) < 3):
            continue  # world-fixed translation axis
        for j in range(nv):
            bj, jj = int(model.dof_bodyid[j]), int(model.dof_jntid[j])
            if bj == bi:
                if jj <= ji:
                    dm[i, j] = 1.0
            elif model.ancestor_mask[bi, bj] and bj != bi:
                dm[i, j] = 1.0
    return dm


_PREFIX_CACHE: dict = {}


def dof_prefix_mask(model: Model) -> np.ndarray:
    key = id(model)
    if key not in _PREFIX_CACHE:
        _PREFIX_CACHE[key] = _dof_prefix_mask(model)
    return _PREFIX_CACHE[key]


def kinematics(model: Model, qpos: jnp.ndarray) -> KinOut:
    """Forward kinematics + dof axes + spatial inertias + mass matrix.

    The body/joint loops below run at *trace time* (nbody <= ~15 for the
    reference assets) and unroll into a static graph; the heavy lifting (mass
    matrix assembly) is einsums."""
    dt = qpos.dtype
    c = lambda a: jnp.asarray(a, dt)
    eye3 = jnp.eye(3, dtype=dt)

    xpos = [jnp.zeros(3, dt)]
    xquat = [c([1.0, 0, 0, 0])]
    xanchor = [None] * model.njnt
    xaxis = [None] * model.njnt
    S = [None] * model.nv

    for b in range(1, model.nbody):
        p = int(model.body_parentid[b])
        pq = xquat[p]
        pos = xpos[p] + spatial.quat_rotate(pq, c(model.body_pos[b]))
        quat = spatial.quat_mul(pq, c(model.body_quat[b]))
        # apply this body's joints in order
        jids = [j for j in range(model.njnt) if model.jnt_bodyid[j] == b]
        for j in jids:
            jt = int(model.jnt_type[j])
            qadr = int(model.jnt_qposadr[j])
            dadr = int(model.jnt_dofadr[j])
            if jt == JNT_FREE:
                pos = qpos[qadr:qadr + 3]
                quat = spatial.quat_normalize(qpos[qadr + 3:qadr + 7])
                anchor, axis = pos, c([0.0, 0, 1])
                R = spatial.quat_to_mat(quat)
                # 3 world-frame translations + 3 child-frame rotations
                for k in range(3):
                    e = jnp.zeros(3, dt).at[k].set(1.0)
                    S[dadr + k] = jnp.concatenate([jnp.zeros(3, dt), e])
                for k in range(3):
                    w = R[:, k]
                    S[dadr + 3 + k] = jnp.concatenate([w, jnp.cross(pos, w)])
            else:
                anchor = pos + spatial.quat_rotate(quat, c(model.jnt_pos[j]))
                axis = spatial.quat_rotate(quat, c(model.jnt_axis[j]))
                if jt == JNT_SLIDE:
                    pos = pos + axis * (qpos[qadr] - c(model.qpos0[qadr]))
                    S[dadr] = jnp.concatenate([jnp.zeros(3, dt), axis])
                elif jt == JNT_HINGE:
                    angle = qpos[qadr] - c(model.qpos0[qadr])
                    qloc = spatial.axis_angle_to_quat(
                        c(model.jnt_axis[j]), angle)
                    quat = spatial.quat_mul(quat, qloc)
                    pos = anchor - spatial.quat_rotate(
                        quat, c(model.jnt_pos[j]))
                    S[dadr] = jnp.concatenate(
                        [axis, jnp.cross(anchor, axis)])
                elif jt == JNT_BALL:
                    qloc = spatial.quat_normalize(qpos[qadr:qadr + 4])
                    quat = spatial.quat_mul(quat, qloc)
                    pos = anchor - spatial.quat_rotate(
                        quat, c(model.jnt_pos[j]))
                    R = spatial.quat_to_mat(quat)
                    for k in range(3):
                        w = R[:, k]
                        S[dadr + k] = jnp.concatenate(
                            [w, jnp.cross(anchor, w)])
            xanchor[j], xaxis[j] = anchor, axis
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = spatial.quat_to_mat(xquat)
    S = (jnp.stack(S) if model.nv else jnp.zeros((0, 6), dt))
    xanchor = (jnp.stack(xanchor) if model.njnt
               else jnp.zeros((0, 3), dt))
    xaxis = (jnp.stack(xaxis) if model.njnt else jnp.zeros((0, 3), dt))

    # inertial frames and spatial inertias.  mat3_mul/mat3_vec (component
    # form) instead of @/einsum: tiny batched dot_generals force 57x
    # tile-padded layout copies under the batched AD linearizer (see
    # spatial.mat3_mul)
    xipos = xpos + spatial.mat3_vec(xmat, c(model.body_ipos))
    ximat = spatial.mat3_mul(xmat, spatial.quat_to_mat(c(model.body_iquat)))
    inertia = spatial.spatial_inertia(
        c(model.body_mass), c(model.body_inertia), xipos, ximat)

    # geoms
    geom_xpos = (xpos[model.geom_bodyid]
                 + spatial.mat3_vec(xmat[model.geom_bodyid],
                                    c(model.geom_pos)))
    geom_xmat = spatial.mat3_mul(xmat[model.geom_bodyid],
                                 spatial.quat_to_mat(c(model.geom_quat)))

    # mass matrix: M = sum_b (mask_b * S)^T I_b (mask_b * S)  -- one einsum
    mask = c(model.dof_mask)                       # (nbody, nv)
    SB = mask[:, :, None] * S[None, :, :]          # (nbody, nv, 6)
    tmp = jnp.einsum("bix,bxy->biy", SB, inertia)
    M = jnp.einsum("biy,bjy->ij", tmp, SB)
    M = M + jnp.diag(c(model.dof_armature))

    return KinOut(xpos, xquat, xmat, xipos, ximat, xanchor, xaxis, S,
                  inertia, M, geom_xpos, geom_xmat)


def body_velocities(model: Model, kin: KinOut, qvel: jnp.ndarray):
    """Spatial velocity of every body: V_b = sum_i mask[b,i] S_i qvel_i."""
    mask = jnp.asarray(model.dof_mask, qvel.dtype)
    return jnp.einsum("bi,ix,i->bx", mask, kin.S, qvel)


def bias_force(model: Model, kin: KinOut, qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_bias = C(q, qvel) + G: RNE with qacc=0 as masked einsums.

    Gravity enters as a fictitious base acceleration (standard RNEA trick),
    matching mjData.qfrc_bias semantics: M qacc + qfrc_bias = qfrc_smooth'."""
    dt = qvel.dtype
    c = lambda a: jnp.asarray(a, dt)
    mask = c(model.dof_mask)                        # (nbody, nv)
    V = jnp.einsum("bi,ix,i->bx", mask, kin.S, qvel)  # (nbody,6)

    # velocity-product acceleration: per-dof prefix velocities
    DM = c(dof_prefix_mask(model))                  # (nv, nv)
    Sqd = kin.S * qvel[:, None]                     # (nv,6)
    Vpre = DM @ Sqd                                 # (nv,6)
    Sdot_qd = spatial.cross_motion(Vpre, kin.S) * qvel[:, None]  # (nv,6)
    A = jnp.einsum("bi,ix->bx", mask, Sdot_qd)      # (nbody,6)

    # gravity as base acceleration: a0 = (0, -g)  =>  subtract from A
    if not model.opt.disable_gravity:
        g = c(model.opt.gravity)
        A = A - jnp.concatenate([jnp.zeros(3, dt), g])[None, :]

    IV = jnp.einsum("bxy,by->bx", kin.inertia, V)
    F = jnp.einsum("bxy,by->bx", kin.inertia, A) + spatial.cross_force(V, IV)
    return jnp.einsum("bi,ix,bx->i", mask, kin.S, F)


def passive_force(model: Model, qpos: jnp.ndarray,
                  qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_passive: joint springs + dampers (mj_passive analog).

    spring: -stiffness * (qpos - qpos_spring) on slide/hinge joints;
    damper: -dof_damping * qvel."""
    dt = qvel.dtype
    c = lambda a: jnp.asarray(a, dt)
    qfrc = -c(model.dof_damping) * qvel
    for j in range(model.njnt):
        k = float(model.jnt_stiffness[j])
        if k == 0.0:
            continue
        jt = int(model.jnt_type[j])
        qadr, dadr = int(model.jnt_qposadr[j]), int(model.jnt_dofadr[j])
        if jt in (JNT_SLIDE, JNT_HINGE):
            qfrc = qfrc.at[dadr].add(
                -k * (qpos[qadr] - c(model.qpos_spring[qadr])))
        elif jt == JNT_BALL:
            dq = spatial.quat_sub(qpos[qadr:qadr + 4],
                                  c(model.qpos_spring[qadr:qadr + 4]))
            qfrc = qfrc.at[dadr:dadr + 3].add(-k * dq)
        elif jt == JNT_FREE:
            qfrc = qfrc.at[dadr:dadr + 3].add(
                -k * (qpos[qadr:qadr + 3]
                      - c(model.qpos_spring[qadr:qadr + 3])))
            dq = spatial.quat_sub(qpos[qadr + 3:qadr + 7],
                                  c(model.qpos_spring[qadr + 3:qadr + 7]))
            qfrc = qfrc.at[dadr + 3:dadr + 6].add(-k * dq)
    return qfrc


def actuator_force(model: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    """qfrc_actuator for motor/joint transmissions: gear * clamp(ctrl) on the
    joint's dofs (first dof for multi-dof joints is not supported by motors in
    the reference assets — all motors drive hinges/slides)."""
    dt = ctrl.dtype
    c = lambda a: jnp.asarray(a, dt)
    qfrc = jnp.zeros((model.nv,), dt)
    if model.nu == 0:
        return qfrc
    if not model.opt.disable_clampctrl:
        lo = c(model.actuator_ctrlrange[:, 0])
        hi = c(model.actuator_ctrlrange[:, 1])
        limited = jnp.asarray(model.actuator_ctrllimited)
        ctrl = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)
    force = c(model.actuator_gear) * ctrl
    dofadr = model.jnt_dofadr[model.actuator_trnid]
    return qfrc.at[dofadr].add(force)


def applied_force(model: Model, kin: KinOut,
                  qfrc_applied: jnp.ndarray,
                  xfrc_applied: jnp.ndarray) -> jnp.ndarray:
    """qfrc from user-applied generalized + Cartesian forces.

    xfrc_applied rows are (force[3], torque[3]) at the body com in world
    coordinates (mjData.xfrc_applied semantics — part of the cpMjData state
    subset, /root/reference/src/util.cpp:11)."""
    dt = qfrc_applied.dtype
    f = xfrc_applied[:, :3]
    t = xfrc_applied[:, 3:]
    # Plücker wrench at origin: (torque + com x force, force)
    w = jnp.concatenate([t + jnp.cross(kin.xipos, f), f], axis=-1)
    mask = jnp.asarray(model.dof_mask, dt)
    return qfrc_applied + jnp.einsum("bi,ix,bx->i", mask, kin.S, w)


def smooth_dynamics(model: Model, qpos, qvel, ctrl, qfrc_applied,
                    xfrc_applied):
    """Full smooth pipeline: returns (kin, qfrc_smooth, qacc_smooth, Mfac).

    qacc_smooth = M^{-1} qfrc_smooth  (mj_fwdAcceleration analog)."""
    kin = kinematics(model, qpos)
    qfrc_bias = bias_force(model, kin, qvel)
    qfrc_passive = passive_force(model, qpos, qvel)
    qfrc_actuator = actuator_force(model, ctrl)
    qfrc_smooth = (qfrc_passive + qfrc_actuator - qfrc_bias
                   + applied_force(model, kin, qfrc_applied, xfrc_applied))
    # pure-JAX Cholesky (ops/linalg.py): no LAPACK custom calls — see the
    # miscompile note there; Mfac is the lower factor L
    from ..ops import linalg
    Mfac = linalg.cholesky(kin.M)
    qacc_smooth = linalg.cho_solve(Mfac, qfrc_smooth)
    return kin, qfrc_smooth, qacc_smooth, Mfac


def point_jacobian(model: Model, kin: KinOut, point: jnp.ndarray,
                   bodyid) -> jnp.ndarray:
    """Translational Jacobian (3, nv) of world `point` on body `bodyid`.

    Row i: S_lin_i + S_ang_i x point, masked by whether dof i moves the body.
    `bodyid` may be a traced integer (gather over the static dof mask)."""
    mask = jnp.asarray(model.dof_mask, point.dtype)[bodyid]      # (nv,)
    lin = kin.S[:, 3:] + jnp.cross(kin.S[:, :3], point[None, :])
    return (mask[:, None] * lin).T                                # (3, nv)
