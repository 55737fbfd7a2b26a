"""Control-limited iLQG: boxQP unit tests (vs an exhaustive active-set
oracle) and integration tests on the pendulum with tightened ctrl ranges.

The reference solver ignores the `ctrlrange` its own assets declare
(/root/reference/res/hopper.xml:6,32-34); MuJoCo clamps inside the actuation
stage so the optimizer's controls silently differ from the applied ones.
control_limits=True makes the solver limit-aware (Tassa/Mansard/Todorov
ICRA 2014 boxQP backward pass, ops/boxqp.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqg_mujoco_tpu import ilqr
from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.ops.boxqp import boxqp
from ilqg_mujoco_tpu.physics.model import make_state


def _rand_spd(rng, n, cond=10.0):
    Q = rng.standard_normal((n, n))
    U, _ = np.linalg.qr(Q)
    d = np.geomspace(1.0, cond, n)
    return (U * d) @ U.T


def test_boxqp_unconstrained_matches_newton():
    rng = np.random.default_rng(0)
    Q = jnp.asarray(_rand_spd(rng, 4))
    g = jnp.asarray(rng.standard_normal(4))
    big = jnp.full(4, 1e9)
    out = jax.jit(boxqp)(Q, g, -big, big, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(out.x),
                               np.linalg.solve(np.asarray(Q), -np.asarray(g)),
                               rtol=1e-8, atol=1e-10)
    assert bool(jnp.all(out.free)) and bool(out.pd)


def _oracle_box_min(Q, g, lo, hi):
    """Global box-QP minimum by enumerating all 3^n active-set patterns:
    for a strictly convex QP the optimum's active set is one of these, and
    its candidate is feasible, so min-over-feasible-candidates is exact."""
    n = len(g)
    best_val, best_x = np.inf, None
    for pat in range(3 ** n):
        code = [(pat // 3 ** i) % 3 for i in range(n)]  # 0=lo,1=free,2=hi
        x = np.where(np.array(code) == 0, lo,
                     np.where(np.array(code) == 2, hi, 0.0))
        f = [i for i in range(n) if code[i] == 1]
        if f:
            rhs = -(g[f] + Q[np.ix_(f, [i for i in range(n)
                                         if i not in f])]
                    @ x[[i for i in range(n) if i not in f]])
            x[f] = np.linalg.solve(Q[np.ix_(f, f)], rhs)
        if np.any(x < lo - 1e-12) or np.any(x > hi + 1e-12):
            continue
        val = 0.5 * x @ Q @ x + g @ x
        if val < best_val:
            best_val, best_x = val, x
    return best_val, best_x


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_boxqp_matches_active_set_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 3
    Q = _rand_spd(rng, n, cond=30.0)
    g = 2.0 * rng.standard_normal(n)
    lo, hi = -np.ones(n), np.ones(n)
    ref_val, _ = _oracle_box_min(Q, g, lo, hi)
    out = jax.jit(lambda *a: boxqp(*a, iters=20))(
        jnp.asarray(Q), jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi),
        jnp.zeros(n))
    x = np.asarray(out.x)
    assert np.all(x >= lo - 1e-10) and np.all(x <= hi + 1e-10)
    val = 0.5 * x @ Q @ x + g @ x
    assert val <= ref_val + 1e-8, (val, ref_val)


def _tight_pendulum(umax=None):
    env = envs.pendulum(mode="tassa", engine="ad")
    if umax is None:
        return env
    m = dataclasses.replace(
        env.model,
        actuator_ctrlrange=np.array([[-umax, umax]]),
        actuator_ctrllimited=np.array([True]))
    return dataclasses.replace(env, model=m)


def test_control_limits_off_vs_unlimited_identical():
    """With no limited actuator the boxQP path degenerates to exactly the
    unconstrained Newton solve — both solver variants must agree."""
    env = envs.pendulum(mode="tassa", engine="ad")
    m = dataclasses.replace(env.model,
                            actuator_ctrllimited=np.array([False]))
    s0 = make_state(m).replace(qpos=jnp.asarray([0.1, 0.4]))
    cfg_off = dataclasses.replace(env.ilqr, iterations=5)
    cfg_on = dataclasses.replace(cfg_off, control_limits=True)
    sol0 = ilqr.init_solver(m, s0, cfg_off)
    _, tr_off = jax.jit(lambda s: ilqr.solve(m, env.cost_fn, s0, s,
                                             cfg_off))(sol0)
    _, tr_on = jax.jit(lambda s: ilqr.solve(m, env.cost_fn, s0, s,
                                            cfg_on))(sol0)
    np.testing.assert_allclose(np.asarray(tr_on), np.asarray(tr_off),
                               rtol=1e-9, atol=1e-12)


def test_control_limited_solve_respects_box_and_descends():
    """Tight ctrl box (|u| <= 0.35): the solve must keep every stored control
    inside the box, descend, and beat the limit-blind solver's true cost
    (recosted with the controls the plant actually applies)."""
    umax = 0.35
    env = _tight_pendulum(umax)
    m = env.model
    s0 = make_state(m).replace(qpos=jnp.asarray([0.15, 0.6]))
    cfg_naive = dataclasses.replace(env.ilqr, iterations=10)
    cfg_box = dataclasses.replace(cfg_naive, control_limits=True)

    sol0 = ilqr.init_solver(m, s0, cfg_box)
    solb, trb = jax.jit(lambda s: ilqr.solve(m, env.cost_fn, s0, s,
                                             cfg_box))(sol0)
    ctrl = np.asarray(solb.traj.ctrl)
    assert np.all(np.abs(ctrl) <= umax + 1e-8), np.abs(ctrl).max()
    trb = np.asarray(trb)
    assert np.all(np.isfinite(trb)) and trb[-1] < trb[0]

    # limit-blind solve on the same limited plant, recosted with the clamp
    # the actuation stage applies (physics/smooth.py)
    soln, _ = jax.jit(lambda s: ilqr.solve(m, env.cost_fn, s0, s,
                                           cfg_naive))(sol0)
    u_cl = jnp.clip(soln.traj.ctrl, -umax, umax)
    cost_naive = float(jnp.sum(jax.vmap(env.cost_fn)(
        soln.traj.qpos, soln.traj.qvel, u_cl)))
    assert trb[-1] <= cost_naive + 1e-9, (trb[-1], cost_naive)
