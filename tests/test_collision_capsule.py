"""Capsule-capsule narrow-phase parity vs the MuJoCo C core.

MuJoCo's mjc_CapsuleCapsule emits TWO contacts when the axes are exactly
parallel (at the endpoints of the axial overlap interval, degenerating to
duplicates without axial overlap) and one closest-point contact otherwise.
Verified here geometry-for-geometry and through qacc."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from ilqg_mujoco_tpu.physics import collision, forward as fwd, mjcf, smooth
from ilqg_mujoco_tpu.physics.model import make_state

XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 0">
      <joint type="free"/>
      <geom type="capsule" size="0.1 0.5" fromto="-0.5 0 0 0.5 0 0"/>
    </body>
    <body pos="0 0 0">
      <joint type="free"/>
      <geom type="capsule" size="0.1 0.5" fromto="{ft}"/>
    </body>
  </worldbody>
</mujoco>
"""


def _models(fromto):
    xml = XML.format(ft=fromto)
    mm = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mm)
    m = mjcf.load_model(xml_string=xml)
    return m, mm, md


def _active_contacts(m, s):
    kin = smooth.kinematics(m, s.qpos)
    con = collision.collide(m, kin.geom_xpos, kin.geom_xmat)
    act = np.asarray(con.dist) < np.asarray(con.margin - con.gap)
    return (np.asarray(con.dist)[act], np.asarray(con.pos)[act],
            np.asarray(con.frame)[act])


CASES = [
    # (fromto of capsule 2, expected ncon)
    ("-0.5 0 0.15 0.5 0 0.15", 2),     # parallel, full axial overlap
    ("0.1 0 0.15 1.1 0 0.15", 2),      # parallel, partial overlap
    ("0.6 0 0.15 1.6 0 0.15", 2),      # parallel, NO axial overlap (dupes)
    ("0.5 0 0.15 -0.5 0 0.15", 2),     # antiparallel
    ("0 -0.5 0.15 0 0.5 0.15", 1),     # crossed
    ("-0.5 0.02 0.15 0.5 -0.02 0.15", 1),  # near-parallel -> single contact
]


@pytest.mark.parametrize("fromto,ncon", CASES)
def test_contact_geometry_parity(fromto, ncon):
    m, mm, md = _models(fromto)
    mujoco.mj_forward(mm, md)
    assert md.ncon == ncon

    s = make_state(m)
    dist, pos, frame = _active_contacts(m, s)
    assert len(dist) == ncon

    key = lambda t: t[1]   # sort by (rounded) position; dists can tie
    ref = sorted(((md.contact[i].dist, tuple(np.round(md.contact[i].pos, 9)),
                   tuple(np.round(md.contact[i].frame[:3], 9)))
                  for i in range(md.ncon)), key=key)
    got = sorted(((d, tuple(np.round(p, 9)), tuple(np.round(f[0], 9)))
                  for d, p, f in zip(dist, pos, frame)), key=key)
    for (rd, rp, rn), (gd, gp, gn) in zip(ref, got):
        np.testing.assert_allclose(gd, rd, atol=1e-9)
        np.testing.assert_allclose(gp, rp, atol=1e-9)
        np.testing.assert_allclose(gn, rn, atol=1e-9)


@pytest.mark.parametrize("fromto", [c[0] for c in CASES])
def test_qacc_parity(fromto):
    m, mm, md = _models(fromto)
    mujoco.mj_forward(mm, md)
    s = fwd.forward(m, make_state(m))
    np.testing.assert_allclose(np.asarray(s.qacc), md.qacc,
                               rtol=1e-6, atol=1e-6)


def test_parallel_stack_trajectory():
    """Two parallel capsules falling/stacking on each other: trajectory
    agreement through the 2-contact parallel branch under Euler."""
    m, mm, md = _models("-0.5 0 0.25 0.5 0 0.25")
    # drop capsule 2 onto capsule 1 (capsule 1 also falls; both free)
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for i in range(100):
        mujoco.mj_step(mm, md)
        s = step(s)
    np.testing.assert_allclose(np.asarray(s.qpos), md.qpos, atol=1e-4)
