"""Constraint assembly: joint limits + contacts -> unilateral constraint rows
(J, D, aref) for the projected-CG solver.

Implements MuJoCo's soft-constraint model, validated row-for-row against the
``mujoco`` bindings (tests/test_constraint_parity.py):

* impedance imp(r) from solimp evaluated at r = dist - margin,
* reference acceleration  aref = -b*vel - k*(pos - margin)  with
  b = 2/(dmax*tc), k = imp/(dmax^2 tc^2 dampratio^2) and the stability clamp
  tc >= 2*timestep,
* regularizer R = (1-imp)/imp * invweight, with compile-time invweight0
  weights (dof_invweight0 for limits, summed translational body_invweight0
  for contacts) and the pyramidal-row factor 2*mu^2*(1+mu^2),
* pyramidal friction-cone rows J = Jn +/- mu*Jt (2*(condim-1) per contact),
  matching cone="pyramidal" in the reference models
  (/root/reference/res/humanoid.xml:19).

Every row is unilateral (the reference assets have no equality constraints or
friction loss): a row exerts force only while (J qacc - aref) < 0 and the row
is included (dist < margin - gap).  Inclusion is static-shape: excluded rows
get D = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .collision import Contacts
from .model import JNT_HINGE, JNT_SLIDE, Model
from .smooth import KinOut

_MINIMP, _MAXIMP = 0.0001, 0.9999


class Efc(NamedTuple):
    J: jnp.ndarray      # (nefc, nv)
    D: jnp.ndarray      # (nefc,)   inverse regularizer (0 for excluded rows)
    aref: jnp.ndarray   # (nefc,)
    pos: jnp.ndarray    # (nefc,)   raw constraint distance (diagnostics)


def _impedance(solimp, r):
    """MuJoCo getimpedance(): position-dependent constraint impedance at
    violation r."""
    dmin, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                     solimp[..., 2], solimp[..., 3],
                                     solimp[..., 4])
    x = jnp.abs(r) / jnp.where(width > 1e-15, width, 1.0)
    x = jnp.clip(x, 0.0, 1.0)
    y_lo = (x / jnp.where(mid > 1e-15, mid, 1.0)) ** power * mid
    y_hi = 1.0 - ((1.0 - x) / jnp.where(1.0 - mid > 1e-15, 1.0 - mid, 1.0)
                  ) ** power * (1.0 - mid)
    y = jnp.where(x <= mid, y_lo, y_hi)
    imp = dmin + y * (dmax - dmin)
    return jnp.clip(imp, _MINIMP, _MAXIMP)


def _kb(solref, solimp, imp, timestep):
    """Stiffness/damping from solref: standard (tc, dampratio) form with the
    tc >= 2*timestep stability clamp, or 'direct' (-stiffness, -damping)."""
    tc, dr = solref[..., 0], solref[..., 1]
    dmax = solimp[..., 1]
    tc_eff = jnp.maximum(tc, 2.0 * timestep)
    b_std = 2.0 / jnp.maximum(dmax * tc_eff, 1e-15)
    k_std = imp / jnp.maximum(
        dmax * dmax * tc_eff * tc_eff * dr * dr, 1e-15)
    b = jnp.where(tc > 0, b_std, -dr)
    k = jnp.where(tc > 0, k_std, -tc * imp)
    return k, b


def make_efc(model: Model, kin: KinOut, qpos: jnp.ndarray, qvel: jnp.ndarray,
             contacts: Contacts) -> Efc:
    """Assemble all unilateral constraint rows (static shape)."""
    dt = qvel.dtype
    c = lambda a: jnp.asarray(a, dt)
    rows_J, rows_dist, rows_margin = [], [], []
    rows_solref, rows_solimp, rows_invw, rows_included = [], [], [], []

    def add_row(J, dist, margin, solref, solimp, invw, included):
        rows_J.append(J)
        rows_dist.append(jnp.asarray(dist, dt))
        rows_margin.append(jnp.asarray(margin, dt))
        rows_solref.append(solref)
        rows_solimp.append(solimp)
        rows_invw.append(jnp.asarray(invw, dt))
        rows_included.append(included)

    # ---- joint limits (slide/hinge) ------------------------------------
    if not model.opt.disable_limit:
        for j in range(model.njnt):
            if not model.jnt_limited[j]:
                continue
            jt = int(model.jnt_type[j])
            if jt not in (JNT_SLIDE, JNT_HINGE):
                continue
            qadr, dadr = int(model.jnt_qposadr[j]), int(model.jnt_dofadr[j])
            margin = float(model.jnt_margin[j])
            r0, r1 = model.jnt_range[j]
            qj = qpos[qadr]
            # lower: dist = q - r0, J = +e ; upper: dist = r1 - q, J = -e
            for sgn, rr in ((1.0, float(r0)), (-1.0, float(r1))):
                dist = sgn * (qj - rr)
                J = jnp.zeros((model.nv,), dt).at[dadr].set(sgn)
                add_row(J, dist, margin, c(model.jnt_solref[j]),
                        c(model.jnt_solimp[j]),
                        float(model.dof_invweight0[dadr]),
                        dist < margin)

    # ---- contacts (pyramidal cone) -------------------------------------
    if not model.opt.disable_contact and len(contacts.dist) > 0:
        biw = model.body_invweight0
        for i in range(len(contacts.dist)):
            b1 = int(contacts.body1[i])
            b2 = int(contacts.body2[i])
            condim = int(contacts.condim[i])
            n = contacts.frame[i, 0]
            pos_w = contacts.pos[i]
            margin = float(contacts.margin[i])
            gap = float(contacts.gap[i])
            dist = contacts.dist[i]
            included = dist < (margin - gap)
            invw = float(biw[b1, 0] + biw[b2, 0])
            mask1 = c(model.dof_mask)[b1]
            mask2 = c(model.dof_mask)[b2]
            lin = kin.S[:, 3:] + jnp.cross(kin.S[:, :3], pos_w[None, :])
            Jp = (mask2 - mask1)[:, None] * lin       # (nv, 3) relative jac
            Jn = Jp @ n
            solref_i = c(contacts.solref[i])
            solimp_i = c(contacts.solimp[i])
            if condim == 1:
                add_row(Jn, dist, margin, solref_i, solimp_i, invw, included)
            else:
                mu = float(contacts.friction[i][0])
                invw_pyr = invw * 2.0 * mu * mu * (1.0 + mu * mu)
                for tdim in range(1, min(condim, 3)):
                    t = contacts.frame[i, tdim]
                    Jt = Jp @ t
                    for sgn in (1.0, -1.0):
                        add_row(Jn + sgn * mu * Jt, dist, margin, solref_i,
                                solimp_i, invw_pyr, included)

    nefc = len(rows_J)
    if nefc == 0:
        return Efc(J=jnp.zeros((0, model.nv), dt), D=jnp.zeros((0,), dt),
                   aref=jnp.zeros((0,), dt), pos=jnp.zeros((0,), dt))

    J = jnp.stack(rows_J)                       # (nefc, nv)
    dist = jnp.stack(rows_dist)
    margin = jnp.stack(rows_margin)
    included = jnp.stack(rows_included)
    solref = jnp.stack(rows_solref)
    solimp = jnp.stack(rows_solimp)
    invw = jnp.stack(rows_invw)

    r = dist - margin
    imp = _impedance(solimp, r)
    k, b = _kb(solref, solimp, imp, model.opt.timestep)
    vel = J @ qvel
    aref = -b * vel - k * r

    R = jnp.maximum((1.0 - imp) / imp * invw, 1e-12)
    D = jnp.where(included, 1.0 / R, 0.0)
    return Efc(J=J, D=D, aref=aref, pos=dist)
