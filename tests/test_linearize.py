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
