"""Measure the reference algorithm's throughput on the MuJoCo C core.

The C reference binary itself cannot run in this image (MuJoCo 2.0 + GLFW +
mjkey licensing), so the baseline is the *same algorithm* — the reference's
exact per-MPC-step work schedule — driven through the MuJoCo 3.10 C core via
its python bindings, single process:

per iLQR iteration (inc/ilqr.h:116-186):
    (N+1) mj_step rollout + (N+1) linearizations,
per linearization (src/mjderivative.cpp:43-209):
    1 mj_forward + (nwarmup-1)=2 warmup mj_forwardSkip
    + 2*(2nv+nu) perturbed mj_forwardSkip, all at pinned solver iterations=30.

The inner work is all C (mj_forwardSkip dominates); python adds per-call
overhead comparable to the reference's per-eval bookkeeping.  The measured
number is recorded in baselines.json and consumed by bench.py.

Usage: python tools/measure_baseline.py [--seconds 10]
"""

import argparse
import json
import pathlib
import time

import mujoco
import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent


def linearize_fd(m, d, dmain, warm_buf):
    """One reference linearization at dmain's state (pinned solver)."""
    nv, nu = m.nv, m.nu
    eps = 1e-6
    save_iter, save_tol = m.opt.iterations, m.opt.tolerance
    m.opt.iterations, m.opt.tolerance = 30, 0.0

    def restore():
        d.qpos[:] = dmain.qpos
        d.qvel[:] = dmain.qvel
        d.ctrl[:] = dmain.ctrl
        d.qacc_warmstart[:] = warm_buf

    # center
    d.qpos[:] = dmain.qpos
    d.qvel[:] = dmain.qvel
    d.ctrl[:] = dmain.ctrl
    mujoco.mj_forward(m, d)
    for _ in range(2):
        mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_VEL, 1)
    warm_buf[:] = d.qacc_warmstart
    qacc0 = d.qacc.copy()
    out = np.empty((2 * (2 * nv + nu), nv))
    i = 0
    for sgn in (eps, -eps):
        for k in range(nu):
            restore()
            d.ctrl[k] += sgn
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_VEL, 1)
            out[i] = d.qacc
            i += 1
        for k in range(nv):
            restore()
            d.qvel[k] += sgn
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_POS, 1)
            out[i] = d.qacc
            i += 1
        for k in range(nv):
            restore()
            d.qpos[k] += sgn
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_NONE, 1)
            out[i] = d.qacc
            i += 1
    m.opt.iterations, m.opt.tolerance = save_iter, save_tol
    return qacc0, out


def measure(model_path, horizon, seconds):
    m = mujoco.MjModel.from_xml_path(str(model_path))
    d = mujoco.MjData(m)
    dmain = mujoco.MjData(m)
    warm = np.zeros(m.nv)
    for _ in range(10):
        mujoco.mj_step(m, dmain)

    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        # one iLQR iteration's work: (N+1) steps + (N+1) linearizations
        for _ in range(horizon + 1):
            mujoco.mj_step(m, dmain)
        for _ in range(horizon + 1):
            linearize_fd(m, d, dmain, warm)
        iters += 1
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()
    assets = ROOT / "ilqg_mujoco_tpu" / "models" / "assets"
    out = {}
    for name, asset, horizon in (("pendulum", "cartpole.xml", 20),
                                 ("hopper", "hopper.xml", 40)):
        rate = measure(assets / asset, horizon, args.seconds)
        out[name] = {
            "ilqr_iters_per_s": rate,
            "horizon": horizon,
            "method": "reference algorithm on MuJoCo 3.10 C core via python "
                      "bindings, single process (see module docstring)",
        }
        print(name, out[name])
    path = ROOT / "baselines.json"
    path.write_text(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
