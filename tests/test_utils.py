"""Unit tests for auxiliary subsystems: checkpoint/resume, frame helpers,
profiling."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqg_mujoco_tpu import ilqr, mpc
from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.utils import checkpoint, frames, profiling
from ilqg_mujoco_tpu.physics import forward as fwd
from ilqg_mujoco_tpu.physics.model import make_state


def test_checkpoint_roundtrip(tmp_path):
    env = envs.pendulum()
    s0, sol0 = mpc.init(env)
    p = tmp_path / "ckpt.npz"
    checkpoint.save(p, s0, sol0, extra={"frame": 7})
    s1, sol1, extra = checkpoint.load(p)
    np.testing.assert_array_equal(np.asarray(s0.qpos), np.asarray(s1.qpos))
    np.testing.assert_array_equal(np.asarray(sol0.traj.ctrl),
                                  np.asarray(sol1.traj.ctrl))
    np.testing.assert_array_equal(np.asarray(sol0.K), np.asarray(sol1.K))
    assert int(extra["frame"]) == 7
    # resumed solver state continues identically
    _, tr_a = ilqr.solve(env.model, env.cost_fn, s0, sol0, env.ilqr)
    _, tr_b = ilqr.solve(env.model, env.cost_fn, s1, sol1, env.ilqr)
    np.testing.assert_allclose(np.asarray(tr_a), np.asarray(tr_b), rtol=1e-12)


def test_forward_frame():
    env = envs.pendulum()       # dt=0.02 -> 1 step per 60fps frame... ~0.83
    s = make_state(env.model)
    s2 = frames.forward_frame(env.model, s)
    assert float(s2.time) > 0
    # hopper: dt=0.002 -> 8 steps per frame (round(1/60/0.002))
    envh = envs.hopper()
    sh = frames.forward_frame(envh.model, make_state(envh.model))
    assert abs(float(sh.time) - 8 * 0.002) < 1e-12


def test_timer_phases():
    t = profiling.Timer()
    with t.phase("a") as box:
        box["out"] = jnp.ones(4) * 2
    assert "a" in t.times and t.counts["a"] == 1
    assert t.as_json()
