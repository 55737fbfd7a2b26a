"""Replay/rendering artifact test (VERDICT round 1, missing #5): the viewer
replacement must actually emit frames.  No GL backend exists in this image,
so the matplotlib 2D path (posed by our own kinematics) is the one that must
work; the test asserts a real artifact lands on disk."""

import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from tools import replay  # noqa: E402

from ilqg_mujoco_tpu import mpc  # noqa: E402
from ilqg_mujoco_tpu.models import envs  # noqa: E402


def test_replay_writes_artifact(tmp_path):
    pytest.importorskip("matplotlib")
    env = envs.pendulum()
    out = jax.jit(lambda: mpc.run(env, 6))()
    npz = tmp_path / "traj.npz"
    np.savez(npz, qpos=np.asarray(out.env_states.qpos),
             ctrl=np.asarray(out.controls))

    artifact = replay.replay(str(npz), "pendulum", out=str(tmp_path / "f"),
                             every=2, width=240, height=180)
    assert artifact is not None and pathlib.Path(artifact).exists()
    assert pathlib.Path(artifact).stat().st_size > 1000
