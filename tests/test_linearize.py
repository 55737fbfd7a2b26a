"""Linearizer tests: FD-vs-AD cross-check and the reference's derivative
accuracy test (tst/test_derivatives.cpp) made assertive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.ops.linearize import (LinearizeConfig, linearize_ad,
                                           linearize_fd, linearize_traj)
from ilqg_mujoco_tpu.physics import forward as fwd
from ilqg_mujoco_tpu.physics import mjcf
from ilqg_mujoco_tpu.physics.model import make_state


def _pendulum_state():
    env = envs.pendulum()
    s = make_state(env.model).replace(
        qpos=jnp.asarray([0.1, 0.3]), qvel=jnp.asarray([0.2, -0.5]),
        ctrl=jnp.asarray([0.4]))
    return env, s


def test_fd_vs_ad_pendulum():
    """Central FD with eps=1e-6 and exact forward-mode AD must agree."""
    env, s = _pendulum_state()
    fd = linearize_fd(env.model, s, env.cost_fn)
    ad = linearize_ad(env.model, s, env.cost_fn)
    np.testing.assert_allclose(np.asarray(fd.A), np.asarray(ad.A),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fd.B), np.asarray(ad.B),
                               rtol=1e-4, atol=1e-5)
    # FD cost grads are one-sided (reference protocol) => O(eps) error
    np.testing.assert_allclose(np.asarray(fd.gx), np.asarray(ad.gx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fd.gu), np.asarray(ad.gu),
                               rtol=1e-4, atol=1e-4)


def test_prediction_accuracy_hopper():
    """The reference derivative test, assertive: after warming the hopper 500
    steps and biasing ctrl (tst/test_derivatives.cpp:38-47), the linear model
    A dx + B du must predict the true perturbed next state to first order
    (:85-93 prints this residual for eyeballing; we assert it)."""
    env = envs.hopper()
    m = env.model
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for _ in range(500):
        s = step(s)
    s = s.replace(ctrl=s.ctrl - 0.1)

    lin = linearize_fd(m, s, env.cost_fn)
    h = 1e-6
    # base next state
    s_next = fwd.step(m, s)
    # perturbed next state
    sp = s.replace(qpos=s.qpos + h, qvel=s.qvel + h, ctrl=s.ctrl + h)
    sp_next = fwd.step(m, sp)

    dx = jnp.concatenate([jnp.full((m.nv,), h), jnp.full((m.nv,), h)])
    du = jnp.full((m.nu,), h)
    pred = (jnp.concatenate([s_next.qpos, s_next.qvel])
            + lin.A @ dx + lin.B @ du)
    true = jnp.concatenate([sp_next.qpos, sp_next.qvel])
    resid = np.abs(np.asarray(pred - true))
    # first-order prediction: residual O(h^2) ~ 1e-12, allow slack for the
    # contact-solver's piecewise smoothness
    assert resid.max() < 1e-8, resid


def test_traj_linearization_batches():
    """Whole-horizon vmapped linearization matches per-knot calls."""
    env, s = _pendulum_state()
    traj = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (3,) + a.shape), s)
    cfg = LinearizeConfig(engine="fd")
    lin = linearize_traj(env.model, traj, env.cost_fn, cfg)
    single = linearize_fd(env.model, s, env.cost_fn, cfg)
    np.testing.assert_allclose(np.asarray(lin.A[1]), np.asarray(single.A),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lin.gx[2]), np.asarray(single.gx),
                               rtol=1e-12)


def test_compat_transpose_flag():
    """compat_transpose_A reproduces the reference's transposed lower blocks
    (SURVEY.md §7.0.1)."""
    env, s = _pendulum_state()
    nv = env.model.nv
    a = linearize_fd(env.model, s, env.cost_fn,
                     LinearizeConfig(compat_transpose_A=False))
    b = linearize_fd(env.model, s, env.cost_fn,
                     LinearizeConfig(compat_transpose_A=True))
    np.testing.assert_allclose(np.asarray(a.A[nv:, :nv]),
                               np.asarray(b.A[nv:, :nv]).T, rtol=1e-12)
    # B is identical for nu=1 (the shipped demo's case)
    np.testing.assert_allclose(np.asarray(a.B), np.asarray(b.B), rtol=1e-12)


def test_scramble_B_matches_c_buffer_semantics():
    """compat_scramble_B pins the reference's 1<nu<nv ctrl-Jacobian layout
    bug by DIRECT simulation of the C code: write the flat buffer exactly as
    the worker does (deriv[i + j*nu] = dqacc_j/dctrl_i,
    src/mjderivative.cpp:107), read it back exactly as the column-major
    Eigen Map<Matrix<nv,nu>> does (element (a,b) <- flat[a + b*nv],
    inc/differentiator.h:22,59)."""
    from ilqg_mujoco_tpu.ops.linearize import scramble_B
    rng = np.random.default_rng(0)
    for nv, nu in [(6, 3), (27, 21), (5, 2), (4, 1)]:
        Ju = rng.standard_normal((nv, nu))
        flat = np.zeros(nv * nu)
        for i in range(nu):          # the worker's ctrl loop
            for j in range(nv):
                flat[i + j * nu] = Ju[j, i]
        eigen_read = np.zeros((nv, nu))
        for b in range(nu):          # column-major map read-back
            for a in range(nv):
                eigen_read[a, b] = flat[a + b * nv]
        got = np.asarray(scramble_B(jnp.asarray(Ju)))
        np.testing.assert_array_equal(got, eigen_read)
        if nu == 1:
            np.testing.assert_array_equal(got, Ju)   # no-op for the demo env


def test_scramble_B_flag_wiring_hopper():
    """On a 1<nu<nv model (hopper, nu=3) the flag must actually reach
    _assemble: B's lower block with the flag on is exactly scramble_B of the
    block with it off (and genuinely different)."""
    from ilqg_mujoco_tpu.ops.linearize import scramble_B
    env = envs.hopper()
    m = env.model
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for _ in range(100):
        s = step(s)
    a = linearize_fd(m, s, env.cost_fn,
                     LinearizeConfig(compat_scramble_B=False))
    b = linearize_fd(m, s, env.cost_fn,
                     LinearizeConfig(compat_scramble_B=True))
    nv = m.nv
    np.testing.assert_allclose(
        np.asarray(b.B[nv:]), np.asarray(scramble_B(a.B[nv:])), rtol=1e-12)
    assert np.abs(np.asarray(b.B[nv:]) - np.asarray(a.B[nv:])).max() > 1e-6


def test_chunk_knots_matches_unchunked():
    """chunk_knots (the HBM-limiting path behind the 4096-instance runs) is
    numerically identical to the all-at-once pass, including a padded tail
    (T % chunk != 0)."""
    env, s = _pendulum_state()
    T = 7
    traj = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (T,) + a.shape), s)
    # make knots distinct so a reshape/pad mixup cannot cancel out
    traj = traj.replace(
        qpos=traj.qpos + 0.01 * jnp.arange(T)[:, None],
        qvel=traj.qvel + 0.02 * jnp.arange(T)[:, None])
    full = linearize_traj(env.model, traj, env.cost_fn,
                          LinearizeConfig(engine="fd"))
    for c in (3, 2, 7, 10):   # padded tail, exact fit, chunk > T
        ch = linearize_traj(env.model, traj, env.cost_fn,
                            LinearizeConfig(engine="fd", chunk_knots=c))
        for name in LinOutFields:
            # chunked/unchunked are different XLA executables (lax.map of a
            # small vmap vs one big vmap) => FD noise differs at the
            # (qacc rounding)/2eps ~ 1e-10 level; a pad/reshape bug would be
            # O(1)
            np.testing.assert_allclose(
                np.asarray(getattr(ch, name)),
                np.asarray(getattr(full, name)), rtol=1e-7, atol=1e-9,
                err_msg=f"chunk_knots={c} field={name}")


LinOutFields = ("A", "B", "gx", "gu", "cost")


def test_stage_split_matches_monolithic():
    """The stage-split FD path (mj_forwardSkip economy) must agree with the
    monolithic full-pipeline path — FD noise from different XLA executables
    bounds agreement at ~1e-9, a stage-reuse bug would be O(eps^-1) larger.

    Runs on the cart-pole (limit rows exercise the EfcPos split; small
    graph).  NOTE: the hopper variant of the monolithic graph deterministically
    segfaults this image's XLA:CPU *compiler* when ~40 tests' worth of
    programs precede it in the process (jitted or eager; bisected twice) —
    the contact-rich split path is instead pinned externally by
    test_prediction_accuracy_hopper and the golden hopper solves, which both
    run stage_split=True against MuJoCo-C oracles."""
    env, s = _pendulum_state()
    m = env.model
    split = jax.jit(lambda st: linearize_fd(
        m, st, env.cost_fn, LinearizeConfig(engine="fd", stage_split=True)))(s)
    mono = jax.jit(lambda st: linearize_fd(
        m, st, env.cost_fn, LinearizeConfig(engine="fd", stage_split=False)))(s)
    np.testing.assert_allclose(np.asarray(split.A), np.asarray(mono.A),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(split.B), np.asarray(mono.B),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(split.gx), np.asarray(mono.gx),
                               rtol=1e-6, atol=1e-8)


_BALL_XML = """
<mujoco model="ball_pendulum">
  <option timestep="0.01" integrator="Euler"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="swivel" type="ball" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.04" mass="1"/>
      <body pos="0 0 -0.4">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.02"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="0.5"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="elbow" gear="1"/>
  </actuator>
</mujoco>
"""


def test_quaternion_aware_perturbation_ball_joint():
    """Cheap default-run nq != nv check: a ball-joint pendulum (nq=5, nv=4)
    exercises the tangent-space qpos perturbation (the reference's
    mju_quatIntegrate path, src/mjderivative.cpp:148-171) with FD-vs-AD
    agreement.  The full humanoid variant below stays behind -m slow."""
    m = mjcf.load_model(xml_string=_BALL_XML)
    assert m.nq == 5 and m.nv == 4

    def cost(qpos, qvel, ctrl):
        return (jnp.sum(qpos[:3] ** 2) + 0.1 * jnp.sum(qvel ** 2)
                + 0.01 * jnp.sum(ctrl ** 2))

    s = make_state(m).replace(
        qvel=jnp.asarray([0.3, -0.2, 0.1, 0.4]), ctrl=jnp.asarray([0.2]))
    # tilt the quaternion off identity so the tangent frame is generic
    q = jnp.asarray([0.9689124, 0.199, 0.099, 0.0497])
    s = s.replace(qpos=s.qpos.at[:4].set(q / jnp.linalg.norm(q)))

    fd = linearize_fd(m, s, cost)
    ad = linearize_ad(m, s, cost)
    assert fd.A.shape == (2 * m.nv, 2 * m.nv)
    assert np.all(np.isfinite(np.asarray(fd.A)))
    np.testing.assert_allclose(np.asarray(fd.A), np.asarray(ad.A),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fd.B), np.asarray(ad.B),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_quaternion_aware_perturbation_humanoid():
    """FD linearization of the humanoid (nq=28 != nv=27) stays finite and
    matches AD — exercises tangent-space qpos perturbation on the free
    joint (the case the reference cannot express, SURVEY.md §1)."""
    env = envs.humanoid()
    m = env.model
    s = make_state(m)
    fd = linearize_fd(m, s, env.cost_fn)
    ad = linearize_ad(m, s, env.cost_fn)
    assert np.all(np.isfinite(np.asarray(fd.A)))
    assert fd.A.shape == (2 * m.nv, 2 * m.nv)
    np.testing.assert_allclose(np.asarray(fd.A), np.asarray(ad.A),
                               rtol=2e-3, atol=2e-4)


def test_center_warmup_skip_equivalence():
    """The round-5 skip-stage warmup (_center: one full forward +
    (nwarmup-1) acc-stage-only repetitions, the literal
    mj_forwardSkip(mjSTAGE_VEL) analog of src/mjderivative.cpp:64-68) is
    bit-identical to nwarmup FULL forwards (the rounds-1..4 form): the
    warmup never changes qpos/qvel, so the skipped pos/vel stages are
    recomputations of identical values."""
    from ilqg_mujoco_tpu.ops.linearize import _center
    env, s = _pendulum_state()
    cfg = LinearizeConfig(nwarmup=3)
    got = _center(env.model, s, cfg)
    full = s
    for _ in range(cfg.nwarmup):
        full = fwd.forward(env.model, full, iterations=cfg.niter,
                           tolerance=0.0)
    np.testing.assert_array_equal(np.asarray(got.qacc),
                                  np.asarray(full.qacc))
    np.testing.assert_array_equal(np.asarray(got.qacc_warmstart),
                                  np.asarray(full.qacc_warmstart))
    # contact-rich model too (warmstart chaining actually matters there)
    henv = envs.hopper()
    hs = make_state(henv.model)
    for _ in range(30):
        hs = fwd.step(henv.model, hs)
    got = _center(henv.model, hs, cfg)
    full = hs
    for _ in range(cfg.nwarmup):
        full = fwd.forward(henv.model, full, iterations=cfg.niter,
                           tolerance=0.0)
    np.testing.assert_array_equal(np.asarray(got.qacc),
                                  np.asarray(full.qacc))


def test_exact_engine_rejects_compat_flags():
    """compat_transpose_A/compat_scramble_B reproduce Euler-ASSEMBLY buffer
    quirks; engine='exact' has no Euler assembly, so the combination is a
    silent no-op — it must raise at construction (advisor finding)."""
    with pytest.raises(ValueError, match="exact"):
        LinearizeConfig(engine="exact", compat_transpose_A=True)
    with pytest.raises(ValueError, match="exact"):
        LinearizeConfig(engine="exact", compat_scramble_B=True)
    with pytest.raises(ValueError, match="engine"):
        LinearizeConfig(engine="bogus")
    # valid combinations still construct
    LinearizeConfig(engine="exact")
    LinearizeConfig(engine="fd", compat_transpose_A=True,
                    compat_scramble_B=True)
