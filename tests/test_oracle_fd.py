"""External validation of the golden oracle's FD protocol (VERDICT round 1,
weak #1): tools/golden_ref.py is a transcription of the reference algorithm
by the same author as the JAX solver, so a shared misreading would pass the
golden tests on both sides.  Here the oracle's raw qacc Jacobians are checked
against MuJoCo's own independent FD utility, mjd_transitionFD — code written
by neither side.

Protocol: on an Euler/no-contact cart-pole (so MuJoCo's step Jacobian has
the closed form A = [[I + h^2 Jq_eff, h I + h^2 Jv_eff],
[h Jq_eff, I + h Jv_eff]] with Jq_eff/Jv_eff the effective qacc Jacobians of
the integrator), extract Jq/Jv/Ju from mjd_transitionFD's A/B blocks and
compare with the oracle's central-difference Jacobians (reconstructed from
its quirk-transposed A).  Joint damping=1 is integrated implicitly by
MuJoCo's Euler, shifting Jv_eff by O(h*damping/mass) ~ 1e-3 relative — the
tolerance accommodates that; a transposition or protocol misread would be
O(1)."""

import pathlib
import sys

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from tools import golden_ref  # noqa: E402

ASSET = (pathlib.Path(__file__).resolve().parent.parent
         / "ilqg_mujoco_tpu" / "models" / "assets" / "cartpole.xml")


def test_oracle_jacobians_match_mjd_transitionFD():
    xml = ASSET.read_text().replace('integrator="RK4"', 'integrator="Euler"')
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    d.qpos[:] = [0.12, 0.31]
    d.qvel[:] = [0.25, -0.4]
    d.ctrl[:] = [0.6]
    mujoco.mj_forward(m, d)
    nv, nu, h = m.nv, m.nu, m.opt.timestep

    # independent side: MuJoCo's own FD of the full step
    A = np.zeros((2 * nv, 2 * nv))
    B = np.zeros((2 * nv, nu))
    mujoco.mjd_transitionFD(m, d, 1e-6, True, A, B, None, None)
    Jq_mjd = A[nv:, :nv] / h
    Jv_mjd = (A[nv:, nv:] - np.eye(nv)) / h
    Ju_mjd = B[nv:, :] / h

    # oracle side: RefILQR.linearize (the reference FD protocol transcription)
    ref = golden_ref.RefILQR(m, d, lambda qp, qv, u: 0.0, N=1)
    snap = golden_ref._Snap.of(d)
    A_ref, B_ref, _, _ = ref.linearize(snap)
    # undo the Eigen-map transpose quirk to recover the raw Jacobians
    Jq_ref = (A_ref[nv:, :nv] / h).T
    Jv_ref = ((A_ref[nv:, nv:] - np.eye(nv)) / h).T
    Ju_ref = B_ref[nv:, :] / h

    # MuJoCo's Euler integrates joint damping implicitly: it re-solves
    # qacc_eff = (M + hD)^-1 f_total (f_total still includes the explicit
    # -D qvel damping force), while the oracle's forwardSkip Jacobians are of
    # qacc_raw = M^-1 f_total.  So every effective block carries an exact
    # (M + hD)^-1 M factor.  Apply it, then require agreement to 1e-3*scale (the leftover is the
    # second-order dM/dq x (M+hD)^-1-vs-M^-1 cross term, ~5e-4 relative; a
    # protocol misread or transposition would be O(1)).
    M = np.zeros((nv, nv))
    mujoco.mj_fullM(m, d, M)
    corr = np.linalg.solve(M + h * np.diag(m.dof_damping), M)
    scale = np.abs(Jq_mjd).max()
    np.testing.assert_allclose(corr @ Jq_ref, Jq_mjd, atol=1e-3 * scale)
    np.testing.assert_allclose(corr @ Jv_ref, Jv_mjd, atol=1e-3 * scale)
    np.testing.assert_allclose(corr @ Ju_ref, Ju_mjd, atol=1e-3 * scale)
    # and the quirk really is a transpose: the raw (untransposed) lower-left
    # block must NOT match when the Jacobian is asymmetric
    asym = np.abs(Jq_mjd - Jq_mjd.T).max()
    assert asym > 1e-3 * scale, "test state makes Jq symmetric; pick another"
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(A_ref[nv:, :nv] / h, Jq_mjd,
                                   atol=5e-3 * scale)
