"""iLQR solver and MPC tests: compat recursion cross-checked against an
independent numpy replica, cost descent, and closed-loop balance."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqg_mujoco_tpu import ilqr, mpc
from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.ops.linearize import linearize_traj
from ilqg_mujoco_tpu.physics.model import make_state


def _numpy_backward_compat(A, B, gx, gu, diffs, mu, N):
    """Independent numpy transcription of inc/ilqr.h:133-176 (forward-time
    indexed) used as an oracle for the lax.scan implementation."""
    v = gx[N].copy()
    V = np.outer(v, v)
    nu = B.shape[2]
    nv2 = A.shape[1]
    K = np.zeros((N + 1, nu, nv2))
    k = np.zeros((N + 1, nu))
    for t in range(N - 1, -1, -1):
        V = 0.5 * (V + V.T)
        At, Bt, q, r, c = A[t], B[t], gx[t], gu[t], diffs[t]
        Q = np.outer(q, q)
        R = np.outer(r, r)
        V = V + mu * np.eye(nv2)
        T = -2 * Bt.T @ V @ Bt - 2 * R
        K[t] = np.linalg.solve(T, 2 * Bt.T @ V @ At)
        k[t] = np.linalg.solve(T, Bt.T @ (v + 2 * V @ c) + r)
        ABK = At + Bt @ K[t]
        V = ABK.T @ V @ ABK + Q + K[t].T @ R @ K[t]
        v = 2 * (Bt @ k[t] + c) @ V @ ABK + v @ ABK + q + 2 * k[t] @ R @ K[t]
    return K, k


def test_backward_compat_vs_numpy_oracle():
    env = envs.pendulum()
    m, cfg = env.model, env.ilqr
    s0 = make_state(m).replace(qpos=jnp.asarray([0.05, 0.2]))
    sol = ilqr.init_solver(m, s0, cfg)
    traj = ilqr.forward_pass(m, s0, sol, cfg)
    lin = linearize_traj(m, traj, env.cost_fn, cfg.lin)
    K, k = ilqr.backward_pass_compat(m, traj, lin, cfg)

    diffs = np.concatenate([np.asarray(traj.qpos[1:] - traj.qpos[:-1]),
                            np.asarray(traj.qvel[1:] - traj.qvel[:-1])],
                           axis=1)
    Kn, kn = _numpy_backward_compat(
        np.asarray(lin.A), np.asarray(lin.B), np.asarray(lin.gx),
        np.asarray(lin.gu), diffs, cfg.mu, cfg.horizon)
    np.testing.assert_allclose(np.asarray(K), Kn, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k), kn, rtol=1e-8, atol=1e-10)


def test_compat_solve_decreases_cost():
    """Near-upright pendulum: the reference configuration must reduce cost
    over its 10 iterations (the demo's implicit success criterion)."""
    env = envs.pendulum()
    s0, sol0 = mpc.init(env)
    sol, trace = jax.jit(
        lambda s, so: ilqr.solve(env.model, env.cost_fn, s, so, env.ilqr)
    )(s0, sol0)
    trace = np.asarray(trace)
    assert trace[-1] < 0.5 * trace[0], trace


def test_tassa_solve_decreases_cost_displaced():
    """tassa mode from a 0.6 rad displacement: monotone non-increasing trace
    (linesearch guarantees descent) and large net improvement."""
    env = envs.pendulum(mode="tassa", engine="ad")
    s0 = make_state(env.model).replace(qpos=jnp.asarray([0.0, 0.6]))
    sol0 = ilqr.init_solver(env.model, s0, env.ilqr)
    cost0 = float(jnp.sum(jax.vmap(env.cost_fn)(
        sol0.traj.qpos, sol0.traj.qvel, sol0.traj.ctrl)))
    _, trace = jax.jit(
        lambda s, so: ilqr.solve(env.model, env.cost_fn, s, so, env.ilqr)
    )(s0, sol0)
    trace = np.asarray(trace)
    # trace[i] is the cost after iteration i (trace[0] already improved)
    assert np.all(np.diff(trace) <= 1e-9), trace
    assert trace[-1] < 0.1 * cost0, (trace, cost0)


def test_mpc_balances_pendulum():
    """Closed-loop MPC (reference demo scenario): pole stays upright, cart
    stays near origin over 100 frames (2 simulated seconds)."""
    env = envs.pendulum()
    out = jax.jit(lambda: mpc.run(env, 100))()
    qpos = np.asarray(out.env_states.qpos)
    assert np.abs(qpos[:, 1]).max() < 0.05          # pole angle (rad)
    assert np.abs(qpos[:, 0]).max() < 0.25          # cart position (m)


def test_mpc_cost_trace_shape():
    env = envs.pendulum()
    out = jax.jit(lambda: mpc.run(env, 5))()
    assert out.cost_trace.shape == (5, env.ilqr.iterations)
    assert np.all(np.isfinite(np.asarray(out.cost_trace)))


def test_config_flag_guards():
    """Invalid flag combinations raise at construction instead of silently
    misbehaving (control_limits with a limit-blind backward pass;
    value_scaling silently ignored by the associative-scan backward)."""
    import pytest
    from ilqg_mujoco_tpu.ilqr import ILQRConfig
    with pytest.raises(ValueError, match="control_limits"):
        ILQRConfig(mode="compat", control_limits=True)
    with pytest.raises(ValueError, match="control_limits"):
        ILQRConfig(mode="tassa", backward="assoc", control_limits=True)
    with pytest.raises(ValueError, match="value_scaling"):
        ILQRConfig(mode="tassa", backward="assoc", value_scaling=True)
    with pytest.raises(ValueError, match="mode"):
        ILQRConfig(mode="bogus")
    with pytest.raises(ValueError, match="backward"):
        ILQRConfig(backward="bogus")
    # valid combinations still construct
    ILQRConfig(mode="tassa", control_limits=True)
    ILQRConfig(mode="tassa", backward="assoc")
    ILQRConfig(mode="tassa", value_scaling=True)


def test_mpc_segment_frames_matches_single_program():
    """segment_frames=k (host loop over one compiled k-frame program) is
    numerically identical to the whole-run-as-one-scan path, including a
    ragged final segment."""
    env = envs.pendulum()
    ref = jax.jit(lambda: mpc.run(env, 11))()
    seg = mpc.run(env, 11, segment_frames=4)   # 4+4+3 (ragged tail)
    # rtol 1e-9, atol 1e-13: the segment path compiles a DIFFERENT XLA
    # program (4-frame scan) than the reference (11-frame scan); fusion/
    # summation order may differ at the last few ulps depending on ambient
    # compilation state (observed: exact solo, ~1e-14 absolute inside the
    # full suite)
    np.testing.assert_allclose(np.asarray(seg.env_states.qpos),
                               np.asarray(ref.env_states.qpos),
                               rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(seg.controls),
                               np.asarray(ref.controls),
                               rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(seg.cost_trace),
                               np.asarray(ref.cost_trace),
                               rtol=1e-9, atol=1e-13)
    assert seg.step_cost.shape == (11,)


def test_segment_frames_under_jit_raises():
    """segment_frames' host loop silently inlines into one giant XLA program
    under a trace — exactly what the knob exists to avoid — so run() must
    refuse (advisor finding)."""
    import pytest
    env = envs.pendulum()
    with pytest.raises(ValueError, match="un-jitted"):
        jax.jit(lambda: mpc.run(env, 8, segment_frames=4))()


def test_checkpoint_resume_continues_exactly():
    """5 frames + checkpoint npz roundtrip + 5 resumed frames == 10
    uninterrupted frames (the final_state/final_sol carry is the exact
    solver state, not a re-init)."""
    import tempfile
    from ilqg_mujoco_tpu.utils import checkpoint
    env = envs.pendulum()
    ref = jax.jit(lambda: mpc.run(env, 10))()
    first = jax.jit(lambda: mpc.run(env, 5))()
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        checkpoint.save(f.name, first.final_state, first.final_sol)
        x0, sol0, _ = checkpoint.load(f.name)
    second = jax.jit(lambda: mpc.run(env, 5, x0=x0, sol0=sol0))()
    # 5-frame and 10-frame scans are different XLA programs; allow last-ulp
    # summation-order spread (same rationale as the segment_frames test)
    np.testing.assert_allclose(np.asarray(second.env_states.qpos),
                               np.asarray(ref.env_states.qpos[5:]),
                               rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(second.controls),
                               np.asarray(ref.controls[5:]),
                               rtol=1e-9, atol=1e-13)


def test_tassa_mpc_rebases_on_state_drift():
    """Round-5 regression test: under MPC the tassa acceptance baseline must
    be the feedback rollout from the CURRENT state, and the stored
    trajectory must be rebased onto it even when no candidate improves.

    Pre-fix behavior: cost0 was the STALE stored trajectory's cost; from a
    drifted, genuinely-worse state every candidate exceeded it, so the
    solver rejected everything, kept a trajectory rooted at the old state,
    and emitted frozen controls (measured on the humanoid: |u| = 0 for 130
    straight frames of ballistic collapse)."""
    import dataclasses
    env = envs.pendulum()
    env = dataclasses.replace(env, ilqr=dataclasses.replace(
        env.ilqr, mode="tassa", iterations=3,
        lin=dataclasses.replace(env.ilqr.lin, engine="ad")))
    s0, sol0 = mpc.init(env)
    f = jax.jit(lambda s, so: ilqr.solve(env.model, env.cost_fn, s, so,
                                         env.ilqr))
    sol1, tr1 = f(s0, sol0)
    # drift the env state somewhere strictly worse than the solved traj
    s_bad = s0.replace(qpos=s0.qpos + jnp.asarray([0.4, 0.9]),
                       qvel=s0.qvel + 1.0)
    sol2, tr2 = f(s_bad, sol1)
    # the stored trajectory is rooted at the NEW state regardless of
    # accept/reject (pre-fix it stayed rooted at s0 on rejection)
    np.testing.assert_allclose(np.asarray(sol2.traj.qpos[0]),
                               np.asarray(s_bad.qpos), rtol=0, atol=0)
    # the reported trace reflects rollouts from s_bad, not the stale cost
    assert float(tr2[0]) > float(tr1[-1])
    # plain-solve invariance: re-solving from the SAME state reproduces the
    # stored trajectory through the alpha=0 baseline bit-exactly when no
    # step improves (the trace is monotone non-increasing either way)
    assert np.all(np.diff(np.asarray(tr2)) <= 1e-6)
