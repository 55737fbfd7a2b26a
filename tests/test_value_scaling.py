"""Scaled value recursion (ILQRConfig.value_scaling): exactness in f64 and
f32 overflow immunity at long unstable horizons.

Why this exists: through stiff (solref=.02) contacts the discrete
linearization has |A| >> 1, so the plain recursion's ||Vxx|| grows like
|A|^(2k) and exceeds the f32 range after a few dozen knots — the round-2
humanoid N<=12 TPU limitation (BENCH_NOTES.md).  Gains depend only on
value/cost ratios, so carrying V/s with log s tracked separately is exact
in infinite precision and bounded in any float format.

The overflow stress here amplifies a pendulum linearization to |A|~3 (the
humanoid's stiff-contact regime without its 12-minute XLA:CPU compile):
at N=120, ||Vxx|| ~ 3^240 ~ 1e114 — representable in f64 (the truth
oracle), far beyond f32."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqg_mujoco_tpu import ilqr
from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.ops.linearize import linearize_traj
from ilqg_mujoco_tpu.physics import forward as fwd
from ilqg_mujoco_tpu.physics.model import make_state

MU = 1e-6


def _to32(t):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), t)


def test_scaled_equals_plain_f64_hopper_contact():
    """On a contact-rich hopper horizon the scaled recursion must reproduce
    the plain one to rounding (the dtype-relative reg floor is below f64
    resolution of the involved ratios)."""
    env = envs.hopper()
    m = env.model
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for _ in range(300):
        s = step(s)
    cfg = dataclasses.replace(env.ilqr, horizon=40, iterations=1)
    sol = ilqr.init_solver(m, s, cfg)
    lin = linearize_traj(m, sol.traj, env.cost_fn, cfg.lin)
    mu = jnp.asarray(MU)
    K, k, dV1, dV2, ok = ilqr.backward_pass_tassa(
        m, sol.traj, lin, env.cost_fn, mu, cfg)
    cfg_s = dataclasses.replace(cfg, value_scaling=True)
    Ks, ks, dV1s, dV2s, oks = ilqr.backward_pass_tassa(
        m, sol.traj, lin, env.cost_fn, mu, cfg_s)
    scale = float(jnp.max(jnp.abs(K)))
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(K),
                               rtol=1e-7, atol=1e-7 * scale)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(k),
                               rtol=1e-7,
                               atol=1e-9 * (1 + float(jnp.max(jnp.abs(k)))))
    np.testing.assert_allclose(float(dV1s), float(dV1), rtol=1e-6)
    np.testing.assert_allclose(float(dV2s), float(dV2), rtol=1e-6)
    assert bool(ok) == bool(oks)


@pytest.fixture(scope="module")
def amplified_pendulum():
    """Pendulum linearization with A scaled to |A|~3: the stiff-contact
    value-growth regime in a cheap-to-compile package."""
    env = envs.pendulum(mode="tassa", engine="ad")
    m = env.model
    s = make_state(m).replace(qpos=jnp.asarray([0.1, 0.3]))
    cfg = dataclasses.replace(env.ilqr, horizon=120, iterations=1)
    sol = ilqr.init_solver(m, s, cfg)
    lin = linearize_traj(m, sol.traj, env.cost_fn, cfg.lin)
    lin = lin._replace(A=3.0 * lin.A)
    return env, m, cfg, sol.traj, lin


def test_plain_f32_overflows_scaled_does_not(amplified_pendulum):
    """Plain f32 yields non-finite gains (the solver-stall failure mode);
    scaled f32 yields finite gains whose horizon-wide closed-loop transition
    shrinks the open-loop growth by many orders of magnitude.

    (Weak value-function eigendirections — spread ~3^240 here — are beyond
    ANY f32 recursion's relative range; scaling fixes the overflow
    catastrophe, which is what stalls real solves, not f32's resolution.)"""
    env, m, cfg, traj, lin = amplified_pendulum
    # f64 truth: huge Vxx (~1e114) is representable, gains contract the
    # closed loop essentially to zero
    K64, k64, *_ = ilqr.backward_pass_tassa(
        m, traj, lin, env.cost_fn, jnp.asarray(MU), cfg)
    assert bool(jnp.all(jnp.isfinite(K64)))

    traj32, lin32 = _to32(traj), _to32(lin)
    mu32 = jnp.asarray(MU, jnp.float32)
    Kp, kp, _, _, okp = ilqr.backward_pass_tassa(
        m, traj32, lin32, env.cost_fn, mu32, cfg)
    plain_broken = (not bool(jnp.all(jnp.isfinite(Kp)))
                    or not bool(jnp.all(jnp.isfinite(kp)))
                    or not bool(okp))
    assert plain_broken, "plain f32 recursion should overflow at N=120"

    cfg_s = dataclasses.replace(cfg, value_scaling=True)
    Ks, ks, _, _, oks = ilqr.backward_pass_tassa(
        m, traj32, lin32, env.cost_fn, mu32, cfg_s)
    assert bool(jnp.all(jnp.isfinite(Ks))) and bool(jnp.all(jnp.isfinite(ks)))

    # horizon-wide linearized transition: prod_t (A_t + B_t K_t)
    A = np.asarray(lin.A, np.float64)
    B = np.asarray(lin.B, np.float64)

    def prod_norm(K):
        P = np.eye(A.shape[-1])
        for t in range(cfg.horizon):
            M = A[t] if K is None else A[t] + B[t] @ np.asarray(
                K, np.float64)[t]
            P = M @ P
        return np.linalg.norm(P, 2)

    open_loop = prod_norm(None)                 # ~3^240 * O(1) ~ 1e57
    closed_64 = prod_norm(K64)
    closed_32 = prod_norm(Ks)
    assert closed_64 < 1e-10 * open_loop
    assert closed_32 < 1e-20 * open_loop, (closed_32, open_loop)


def test_scaled_solve_descends(amplified_pendulum):
    """End-to-end: a value-scaled tassa solve still descends (normal,
    unamplified dynamics)."""
    env = envs.pendulum(mode="tassa", engine="ad")
    m = env.model
    s = make_state(m).replace(qpos=jnp.asarray([0.1, 0.5]))
    cfg = dataclasses.replace(env.ilqr, iterations=6, value_scaling=True)
    sol0 = ilqr.init_solver(m, s, cfg)
    _, trace = jax.jit(lambda so: ilqr.solve(m, env.cost_fn, s, so, cfg))(
        sol0)
    tr = np.asarray(trace)
    assert np.all(np.isfinite(tr)) and tr[-1] < tr[0]
