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


class EfcPos(NamedTuple):
    """Position-stage constraint quantities (everything except aref's
    velocity term): the analog of what mj_forwardSkip(mjSTAGE_POS) reuses
    (/root/reference/src/mjderivative.cpp:124).  ``aref_of`` completes the
    assembly for a given qvel."""
    J: jnp.ndarray      # (nefc, nv)
    D: jnp.ndarray      # (nefc,)
    k: jnp.ndarray      # (nefc,)  stiffness
    b: jnp.ndarray      # (nefc,)  damping
    r: jnp.ndarray      # (nefc,)  dist - margin
    pos: jnp.ndarray    # (nefc,)  raw constraint distance

    def aref_of(self, qvel: jnp.ndarray) -> jnp.ndarray:
        return -self.b * (self.J @ qvel) - self.k * self.r

    def with_qvel(self, qvel: jnp.ndarray) -> "Efc":
        return Efc(J=self.J, D=self.D, aref=self.aref_of(qvel),
                   pos=self.pos)


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
    return make_efc_pos(model, kin, qpos, contacts).with_qvel(qvel)


def make_efc_pos(model: Model, kin: KinOut, qpos: jnp.ndarray,
                 contacts: Contacts) -> EfcPos:
    """Position-stage constraint assembly: everything that does not depend on
    qvel (J, D, impedance, k, b, violation r).  The FD linearizer reuses this
    across qvel/ctrl perturbations — the mj_forwardSkip stage economy
    (/root/reference/src/mjderivative.cpp:92,124)."""
    dt = qpos.dtype
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

    # limit rows (few) are built above row-by-row; stack them
    if rows_J:
        J_lim = jnp.stack(rows_J)
        dist_lim = jnp.stack(rows_dist)
        margin_lim = jnp.stack(rows_margin)
        included_lim = jnp.stack(rows_included)
        solref_lim = jnp.stack(rows_solref)
        solimp_lim = jnp.stack(rows_solimp)
        invw_lim = jnp.stack(rows_invw)
    else:
        J_lim = jnp.zeros((0, model.nv), dt)
        dist_lim = margin_lim = invw_lim = jnp.zeros((0,), dt)
        included_lim = jnp.zeros((0,), bool)
        solref_lim = jnp.zeros((0, 2), dt)
        solimp_lim = jnp.zeros((0, 5), dt)

    # ---- contacts (pyramidal cone), fully vectorized over slots ---------
    # Row layout per condim group is precomputed statically; the jnp work is
    # a handful of einsums regardless of slot count (the humanoid has ~80
    # candidate slots -> ~300 rows; a per-row python loop used to dominate
    # trace/compile time).
    ncon = len(contacts.dist)
    if not model.opt.disable_contact and ncon > 0:
        biw = model.body_invweight0
        maskdiff = (model.dof_mask[contacts.body2]
                    - model.dof_mask[contacts.body1])          # (ncon, nv)
        lin = (kin.S[None, :, 3:]
               + jnp.cross(jnp.broadcast_to(kin.S[None, :, :3],
                                            (ncon, model.nv, 3)),
                           contacts.pos[:, None, :]))          # (ncon,nv,3)
        Jp = c(maskdiff)[:, :, None] * lin
        # component form, not einsum: contracting k=3 with a dot_general
        # forces XLA layout copies with the tiny dims minormost — 57x
        # tile-padded temps under the batched AD linearizer (same root
        # cause as the round-5 spatial.py rewrite, see spatial.mat3_mul)
        fr = contacts.frame                                 # (ncon, 3, 3)

        def proj(axis):                                     # axis: (ncon, 3)
            return (Jp[..., 0] * axis[:, 0:1]
                    + Jp[..., 1] * axis[:, 1:2]
                    + Jp[..., 2] * axis[:, 2:3])

        Jnrm = proj(fr[:, 0])
        Jt1 = proj(fr[:, 1])
        Jt2 = proj(fr[:, 2])

        margin_c = np.asarray(contacts.margin)
        gap_c = np.asarray(contacts.gap)
        included_c = contacts.dist < c(margin_c - gap_c)
        mu_c = np.asarray(contacts.friction[:, 0])
        invw_c = (biw[contacts.body1, 0] + biw[contacts.body2, 0])
        invw_pyr = invw_c * 2.0 * mu_c * mu_c * (1.0 + mu_c * mu_c)

        i1 = np.where(contacts.condim == 1)[0]     # static partitions
        i3 = np.where(contacts.condim >= 3)[0]
        mu3 = c(mu_c[i3])[:, None]

        J_con = jnp.concatenate([
            Jnrm[i1],
            Jnrm[i3] + mu3 * Jt1[i3], Jnrm[i3] - mu3 * Jt1[i3],
            Jnrm[i3] + mu3 * Jt2[i3], Jnrm[i3] - mu3 * Jt2[i3]])
        dist_con = jnp.concatenate([contacts.dist[i1]]
                                   + [contacts.dist[i3]] * 4)
        included_con = jnp.concatenate([included_c[i1]]
                                       + [included_c[i3]] * 4)
        margin_con = c(np.concatenate([margin_c[i1]] + [margin_c[i3]] * 4))
        solref_con = c(np.concatenate([contacts.solref[i1]]
                                      + [contacts.solref[i3]] * 4, axis=0))
        solimp_con = c(np.concatenate([contacts.solimp[i1]]
                                      + [contacts.solimp[i3]] * 4, axis=0))
        invw_con = c(np.concatenate([invw_c[i1]] + [invw_pyr[i3]] * 4))
    else:
        J_con = jnp.zeros((0, model.nv), dt)
        dist_con = margin_con = invw_con = jnp.zeros((0,), dt)
        included_con = jnp.zeros((0,), bool)
        solref_con = jnp.zeros((0, 2), dt)
        solimp_con = jnp.zeros((0, 5), dt)

    nefc = J_lim.shape[0] + J_con.shape[0]
    if nefc == 0:
        z = jnp.zeros((0,), dt)
        return EfcPos(J=jnp.zeros((0, model.nv), dt), D=z, k=z, b=z, r=z,
                      pos=z)

    J = jnp.concatenate([J_lim, J_con])
    dist = jnp.concatenate([dist_lim, dist_con])
    margin = jnp.concatenate([margin_lim, margin_con])
    included = jnp.concatenate([included_lim, included_con])
    solref = jnp.concatenate([solref_lim, solref_con])
    solimp = jnp.concatenate([solimp_lim, solimp_con])
    invw = jnp.concatenate([invw_lim, invw_con])

    r = dist - margin
    imp = _impedance(solimp, r)
    k, b = _kb(solref, solimp, imp, model.opt.timestep)

    R = jnp.maximum((1.0 - imp) / imp * invw, 1e-12)
    D = jnp.where(included, 1.0 / R, 0.0)
    return EfcPos(J=J, D=D, k=k, b=b, r=r, pos=dist)
