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


@pytest.mark.parametrize("warm", [100, 320])
def test_hopper_closed_loop_mpc_matches_reference(warm):
    """Closed-loop receding-horizon golden THROUGH CONTACT (the round-3
    verdict's last untested reference-behavior composition): 20 MPC frames on
    the hopper, warm-started gains carried across frames, vs the C-core
    oracle loop (reference semantics,
    src/inverted_pendulum/inverted_pendulum.cpp:19-30).  Two warm-in depths
    probe different contact regimes (early bounce vs settled stance)."""
    import dataclasses

    from ilqg_mujoco_tpu import mpc
    from ilqg_mujoco_tpu.models.envs import Env

    n, iters, frames = 12, 4, 20
    mm = mujoco.MjModel.from_xml_path(str(ASSET))
    md = mujoco.MjData(mm)
    for _ in range(warm):
        mujoco.mj_step(mm, md)
    qpos_ref, ctrl_ref = golden_ref.run_mpc_golden(
        mm, md, _np_cost, n, iters, frames)

    m = mjcf.load_model(str(ASSET))
    cfg = ILQRConfig(horizon=n, iterations=iters, mode="compat",
                     lin=LinearizeConfig(engine="fd",
                                         compat_transpose_A=True))
    env = Env(name="hopper_golden", model=m, cost_fn=_jnp_cost, ilqr=cfg,
              warm_steps=0)
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for _ in range(warm):
        s = step(s)
    out = jax.jit(lambda st: mpc.run(env, frames, st))(s)
    np.testing.assert_allclose(np.asarray(out.env_states.qpos), qpos_ref,
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.controls), ctrl_ref,
                               rtol=1e-3, atol=1e-5)


def test_hopper_solve_bitfaithful_scrambled_B():
    """Bit-faithful compat for 1<nu<nv (SURVEY §7.0.1): with
    compat_scramble_B the solver reproduces the reference BINARY's literal
    behavior — including the ctrl-Jacobian index scramble its column-major
    Eigen map applies to the row-major FD buffer (src/mjderivative.cpp:107
    vs inc/differentiator.h:22,59).  The oracle runs the same scrambled
    layout on the MuJoCo C core; both sides must produce the same
    (deterministically wrong) gains and hence the same trajectories.

    Scope: 2 iterations at warm=100/N=8 — the widest regime where the
    scrambled recursion is still finite.  The garbage gains drive the cost
    UP (trace ~[0.018, 0.073] vs the corrected solver's descent) and by
    iteration 3 the blown-up trajectory makes the scrambled B exactly
    rank-deficient: the (nu x nu) gain solve is singular, numpy raises
    where the reference's Eigen ldlt would emit inf/nan garbage.  Past
    that point 'bit-faithful' is meaningless; the flag's value is pinning
    the layout bug itself, which 2 iterations fully exercise (every
    knot's K/k passes through the scrambled B twice)."""
    warm, n, iters = 100, 8, 2
    mm = mujoco.MjModel.from_xml_path(str(ASSET))
    md = mujoco.MjData(mm)
    for _ in range(warm):
        mujoco.mj_step(mm, md)
    x0 = golden_ref._Snap.of(md)
    ref = golden_ref.RefILQR(mm, md, _np_cost, n, scramble_B=True)
    trace_ref = ref.solve(x0, iters)
    ctrl_ref = np.array([s.ctrl.copy() for s in ref.traj])

    m = mjcf.load_model(str(ASSET))
    cfg = ILQRConfig(horizon=n, iterations=iters, mode="compat",
                     lin=LinearizeConfig(engine="fd",
                                         compat_transpose_A=True,
                                         compat_scramble_B=True))
    s = make_state(m)
    step = jax.jit(lambda st: fwd.step(m, st))
    for _ in range(warm):
        s = step(s)
    sol0 = ilqr.init_solver(m, s, cfg)
    sol, trace = jax.jit(lambda st, so: ilqr.solve(m, _jnp_cost, st, so, cfg)
                         )(s, sol0)
    np.testing.assert_allclose(np.asarray(trace), trace_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.traj.ctrl), ctrl_ref,
                               rtol=1e-3, atol=1e-5)
