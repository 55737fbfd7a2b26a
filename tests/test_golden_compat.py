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
