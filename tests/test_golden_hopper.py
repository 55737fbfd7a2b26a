"""Contact-rich golden parity (BASELINE config 3): compat solver vs the
reference algorithm on the MuJoCo C core, on the hopper.

The reference ships no hopper env; the *solver pipeline* is still fully
defined (FD protocol + recursion are env-independent), so we run both sides
with a simple quadratic hopper cost and compare traces, controls and final
trajectories.  Contacts make this the hard case: the FD protocol (pinned
iterations, shared warmstart) is what keeps central differences stable
across contact boundaries.  Two distinct warm-in depths probe different
contact regimes (early bounce vs settled stance)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from tools import golden_ref  # noqa: E402

from ilqg_mujoco_tpu import ilqr  # noqa: E402
from ilqg_mujoco_tpu.ilqr import ILQRConfig  # noqa: E402
from ilqg_mujoco_tpu.ops.linearize import LinearizeConfig  # noqa: E402
from ilqg_mujoco_tpu.physics import forward as fwd  # noqa: E402
from ilqg_mujoco_tpu.physics import mjcf  # noqa: E402
from ilqg_mujoco_tpu.physics.model import make_state  # noqa: E402

ASSET = (pathlib.Path(__file__).resolve().parent.parent
         / "ilqg_mujoco_tpu" / "models" / "assets" / "hopper.xml")

N = 40          # the env default horizon (models/envs.py)
ITERS = 10      # the reference's per-solve iteration count


def _np_cost(qpos, qvel, ctrl):
    return (1.0 * (qpos[1] - 1.25) ** 2 + 0.1 * qpos[2] ** 2
            + 0.01 * np.sum(qvel ** 2))


def _jnp_cost(qpos, qvel, ctrl):
    return (1.0 * (qpos[1] - 1.25) ** 2 + 0.1 * qpos[2] ** 2
            + 0.01 * jnp.sum(qvel ** 2))


@pytest.mark.parametrize("warm", [100, 320])
def test_hopper_solve_matches_reference(warm):
    # golden side (MuJoCo C core)
    mm = mujoco.MjModel.from_xml_path(str(ASSET))
    md = mujoco.MjData(mm)
    for _ in range(warm):
        mujoco.mj_step(mm, md)
    x0 = golden_ref._Snap.of(md)
    ref = golden_ref.RefILQR(mm, md, _np_cost, N)
    trace_ref = ref.solve(x0, ITERS)
    ctrl_ref = np.array([s.ctrl.copy() for s in ref.traj])
    qpos_ref = np.array([s.qpos.copy() for s in ref.traj])

    # our side (compat + FD + transposed-A quirk, f64)
    m = mjcf.load_model(str(ASSET))
    cfg = ILQRConfig(horizon=N, iterations=ITERS, mode="compat",
                     lin=LinearizeConfig(engine="fd",
                                         compat_transpose_A=True))
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for _ in range(warm):
        s = step(s)
    # verify the warm-in state matches the C core exactly first
    np.testing.assert_allclose(np.asarray(s.qpos), md.qpos, atol=1e-9)
    sol0 = ilqr.init_solver(m, s, cfg)
    sol, trace = jax.jit(lambda st, so: ilqr.solve(m, _jnp_cost, st, so, cfg)
                         )(s, sol0)
    np.testing.assert_allclose(np.asarray(trace), trace_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.traj.ctrl), ctrl_ref,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.traj.qpos), qpos_ref,
                               rtol=1e-4, atol=1e-6)
