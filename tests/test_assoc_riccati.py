"""Parallel (associative-scan) Riccati backward pass vs the sequential scan.

The assoc executor composes conditional value functions with
jax.lax.associative_scan — O(log N) depth on TPU (SURVEY.md §5 long-context
row's stretch goal).  With mu -> 0 it is algebraically identical to the
sequential tassa recursion; these tests pin that equivalence and that full
solves behave identically.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ilqg_mujoco_tpu import ilqr, mpc
from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.ops.linearize import linearize_traj


def _setup(horizon=25):
    env = envs.pendulum(mode="tassa", engine="ad")
    env = dataclasses.replace(
        env, ilqr=dataclasses.replace(env.ilqr, horizon=horizon))
    s0, sol0 = mpc.init(env)
    # one accepted iteration first so the trajectory is non-trivial
    sol1, _ = ilqr.iterate_tassa(env.model, env.cost_fn, s0, sol0, env.ilqr)
    return env, s0, sol1


def test_assoc_backward_matches_sequential():
    env, _, sol = _setup()
    cfg = env.ilqr
    mu = jnp.asarray(1e-9, sol.k.dtype)
    lin = linearize_traj(env.model, sol.traj, env.cost_fn, cfg.lin)
    K_s, k_s, dV1_s, dV2_s, ok_s = ilqr.backward_pass_tassa(
        env.model, sol.traj, lin, env.cost_fn, mu, cfg)
    K_a, k_a, dV1_a, dV2_a, ok_a = ilqr.backward_pass_assoc(
        env.model, sol.traj, lin, env.cost_fn, mu, cfg)
    assert bool(ok_s) and bool(ok_a)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(dV1_a), float(dV1_s), rtol=1e-6)
    np.testing.assert_allclose(float(dV2_a), float(dV2_s), rtol=1e-6)


def test_assoc_solve_descends_like_sequential():
    env, s0, _ = _setup(horizon=40)
    cfg_seq = dataclasses.replace(env.ilqr, iterations=6)
    cfg_par = dataclasses.replace(cfg_seq, backward="assoc")
    _, sol0 = mpc.init(env)

    _, tr_seq = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, cfg_seq))(s0, sol0)
    _, tr_par = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, cfg_par))(s0, sol0)
    tr_seq, tr_par = np.asarray(tr_seq), np.asarray(tr_par)
    assert np.all(np.isfinite(tr_par))
    # same accepted-cost path while mu stays small (they only drift once the
    # LM shift becomes comparable to Quu)
    np.testing.assert_allclose(tr_par, tr_seq, rtol=1e-4)
    # warm-in leaves the pendulum near balance; ~7% descent remains
    assert tr_par[-1] < 0.95 * tr_par[0]
