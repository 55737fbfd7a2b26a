"""THE parity test: compat-mode solver vs the golden reference algorithm
running on the MuJoCo C core (tools/golden_ref.py) — the 'match the C cost
trace' artifact of BASELINE.json configs 1-2."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from tools import golden_ref  # noqa: E402

from ilqg_mujoco_tpu import ilqr, mpc  # noqa: E402
from ilqg_mujoco_tpu.models import envs  # noqa: E402
from ilqg_mujoco_tpu.ops.linearize import LinearizeConfig  # noqa: E402
from ilqg_mujoco_tpu.physics import forward as fwd  # noqa: E402
from ilqg_mujoco_tpu.physics.model import make_state  # noqa: E402

ASSET = (pathlib.Path(__file__).resolve().parent.parent
         / "ilqg_mujoco_tpu" / "models" / "assets" / "cartpole.xml")


@pytest.fixture(scope="module")
def golden():
    return golden_ref.run_pendulum_golden(ASSET, iterations=10)


@pytest.fixture(scope="module")
def ours():
    import dataclasses
    env = envs.pendulum(mode="compat", engine="fd")
    # golden-exact configuration: the reference's transposed-A quirk
    env = dataclasses.replace(
        env, ilqr=dataclasses.replace(
            env.ilqr, lin=LinearizeConfig(engine="fd",
                                          compat_transpose_A=True)))
    s0, sol0 = mpc.init(env)
    sol, trace = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, env.ilqr))(s0, sol0)
    return env, s0, sol, np.asarray(trace)


def test_initial_state_matches(golden, ours):
    """Warm-in protocol produces the same initial state as the C core."""
    _, s0, _, _ = ours
    np.testing.assert_allclose(np.asarray(s0.qpos), golden["x0_qpos"],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s0.qvel), golden["x0_qvel"],
                               atol=1e-12)


def test_cost_trace_matches_reference(golden, ours):
    """Per-iteration cost trace vs the reference algorithm on MuJoCo C.

    FD epsilon noise (eps=1e-6 central differences through two different but
    1e-15-equivalent physics cores) bounds achievable agreement; the trace
    must match to ~1e-5 relative, far tighter than any algorithmic
    difference would allow."""
    _, _, _, trace = ours
    np.testing.assert_allclose(trace, golden["trace"], rtol=1e-5)


def test_final_controls_match_reference(golden, ours):
    """Optimized control sequence after 10 iterations."""
    _, _, sol, _ = ours
    np.testing.assert_allclose(np.asarray(sol.traj.ctrl), golden["ctrl"],
                               rtol=1e-4, atol=1e-7)


def test_final_trajectory_matches_reference(golden, ours):
    _, _, sol, _ = ours
    np.testing.assert_allclose(np.asarray(sol.traj.qpos), golden["qpos"],
                               rtol=1e-5, atol=1e-8)


def test_gains_match_reference(golden, ours):
    """Feedback/feedforward gains from the final backward pass."""
    _, _, sol, _ = ours
    np.testing.assert_allclose(np.asarray(sol.K), golden["K"],
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.k), golden["k"],
                               rtol=1e-3, atol=1e-6)


MPC_FRAMES = 50


def test_closed_loop_mpc_matches_reference(ours):
    """BASELINE config 2: the receding-horizon loop itself, golden-matched.

    The reference's actual product is InvertedPendulum::forward() driven from
    the render loop (/root/reference/src/inverted_pendulum/
    inverted_pendulum.cpp:19-30, cmd/basic.cpp:158-179): re-solve (10
    iterations, warm-started by the long-lived ILQR object), apply the first
    optimized control, step the real environment.  We compare per-frame env
    qpos and applied ctrl over 50 frames against the oracle running the same
    loop on the MuJoCo C core."""
    golden = golden_ref.run_pendulum_golden(ASSET, iterations=10,
                                            mpc_frames=MPC_FRAMES)
    env, s0, sol, _ = ours   # `ours` already ran the initial 10-iter solve

    def frame(carry, _):
        s, so = carry
        s2, so2, (u0, _, _) = mpc.mpc_step(env, s, so)
        return (s2, so2), (s.qpos, u0)

    (_, _), (qpos, ctrl) = jax.jit(lambda s, so: jax.lax.scan(
        frame, (s, so), None, length=MPC_FRAMES))(s0, sol)

    np.testing.assert_allclose(np.asarray(qpos), golden["mpc_qpos"],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ctrl), golden["mpc_ctrl"],
                               rtol=1e-4, atol=1e-7)


def test_long_horizon_T100_matches_reference():
    """BASELINE config 1: single solve at horizon T=100 (the demo config is
    N=20; nothing else exercises long horizons)."""
    import dataclasses
    golden = golden_ref.run_pendulum_golden(ASSET, iterations=10, N=100)

    env = envs.pendulum(mode="compat", engine="fd")
    env = dataclasses.replace(
        env, ilqr=dataclasses.replace(
            env.ilqr, horizon=100,
            lin=LinearizeConfig(engine="fd", compat_transpose_A=True)))
    s0, sol0 = mpc.init(env)
    sol, trace = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, env.ilqr))(s0, sol0)
    # The reference algorithm (fixed mu=1000, full-magnitude k, no
    # linesearch) DIVERGES at T=100 — cost climbs to ~6e7 by iteration 10 on
    # both sides.  That divergence is itself the parity statement: we match
    # the stable early iterations tightly and the chaotic diverged tail to
    # the limit FD-noise amplification allows (~2e-3 observed).
    np.testing.assert_allclose(np.asarray(trace[:5]), golden["trace"][:5],
                               rtol=1e-4)   # FD noise x ~5x longer horizon
    np.testing.assert_allclose(np.asarray(trace), golden["trace"], rtol=5e-3)
    assert trace[-1] > 1e6   # both sides agree the compat mode diverges here


def test_long_horizon_T100_tassa_converges():
    """Where the reference recursion diverges (see above), the tassa mode
    with the exact-discretization engine (adaptive LM + parallel linesearch +
    AD of the full RK4 step — what the reference README *claims* to have,
    README.md:12-13, plus the integrator-consistent Jacobians it lacks,
    SURVEY.md §7.0.9) solves T=100 stably to a local optimum."""
    import dataclasses
    env = envs.pendulum(mode="tassa", engine="exact")
    env = dataclasses.replace(
        env, ilqr=dataclasses.replace(env.ilqr, horizon=100, iterations=15))
    s0, sol0 = mpc.init(env)
    sol, trace = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, env.ilqr))(s0, sol0)
    trace = np.asarray(trace)
    assert np.all(np.isfinite(trace))
    assert np.all(np.diff(trace) <= 1e-9)      # monotone non-increasing
    assert trace[-1] < 0.92 * trace[0]         # real descent, no mu blow-up
    assert float(sol.mu) < 1.0                 # converged, not LM-stalled
