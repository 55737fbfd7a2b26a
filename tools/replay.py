"""Offline trajectory replay / rendering: the host-side replacement for the
reference's GLFW live viewer (/root/reference/cmd/basic.cpp:130-178;
SURVEY.md §2b.4 — rendering moves off the TPU path entirely).

Reads an npz produced by `run.py --out`, steps a MuJoCo visualization model
through the recorded qpos sequence, and writes PNG frames / an MP4 (if
imageio is available) via mujoco.Renderer (OSMesa/EGL).  Falls back to an
ASCII summary when no GL backend exists in the environment.

Usage: python tools/replay.py traj.npz --env pendulum --out frames/
"""

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
ASSETS = ROOT / "ilqg_mujoco_tpu" / "models" / "assets"
_ASSET = {"pendulum": "cartpole.xml", "hopper": "hopper.xml",
          "humanoid": "humanoid.xml"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--env", required=True, choices=list(_ASSET))
    ap.add_argument("--out", default="frames")
    ap.add_argument("--every", type=int, default=1)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    args = ap.parse_args()

    z = np.load(args.npz)
    qpos = z["qpos"]
    print(f"trajectory: {qpos.shape[0]} frames, nq={qpos.shape[1]}")

    try:
        import mujoco
        m = mujoco.MjModel.from_xml_path(str(ASSETS / _ASSET[args.env]))
        d = mujoco.MjData(m)
        r = mujoco.Renderer(m, height=args.height, width=args.width)
    except Exception as e:                           # no GL backend
        print(f"renderer unavailable ({e}); ASCII summary instead:")
        for i in range(0, len(qpos), max(1, len(qpos) // 20)):
            print(f"  t={i:5d}  qpos={np.round(qpos[i], 3)}")
        return

    outdir = pathlib.Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    frames = []
    for i in range(0, len(qpos), args.every):
        d.qpos[:] = qpos[i]
        mujoco.mj_forward(m, d)
        r.update_scene(d)
        px = r.render()
        frames.append(px)
    try:
        import imageio
        imageio.mimsave(outdir / "replay.mp4", frames, fps=60 // args.every)
        print("wrote", outdir / "replay.mp4")
    except Exception:
        try:
            from PIL import Image
            for i, px in enumerate(frames):
                Image.fromarray(px).save(outdir / f"frame_{i:05d}.png")
            print(f"wrote {len(frames)} PNGs to {outdir}/")
        except Exception as e:
            print(f"no image writer available ({e})")


if __name__ == "__main__":
    main()
