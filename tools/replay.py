"""Offline trajectory replay / rendering: the host-side replacement for the
reference's GLFW live viewer (/root/reference/cmd/basic.cpp:130-178;
SURVEY.md §2b.4 — rendering moves off the TPU path entirely).

Reads an npz produced by `run.py --out` and renders the qpos sequence with
the first available backend:

1. ``mujoco.Renderer`` (needs a GL platform — EGL/OSMesa/GLFW);
2. matplotlib 2D (x-z plane), geoms posed by THIS framework's own
   kinematics (physics/smooth.py) — no GL, works in headless CI, and
   doubles as a visual check of the kinematics pipeline;
3. ASCII summary.

Writes replay.mp4 (imageio) or PNG frames into --out.

Usage: python tools/replay.py traj.npz --env pendulum --out frames/
"""

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

ASSETS = ROOT / "ilqg_mujoco_tpu" / "models" / "assets"
_ASSET = {"pendulum": "cartpole.xml", "hopper": "hopper.xml",
          "humanoid": "humanoid.xml"}


def _render_mujoco(qpos, env, outdir, every, width, height):
    import mujoco
    m = mujoco.MjModel.from_xml_path(str(ASSETS / _ASSET[env]))
    d = mujoco.MjData(m)
    r = mujoco.Renderer(m, height=height, width=width)
    frames = []
    for i in range(0, len(qpos), every):
        d.qpos[:] = qpos[i]
        mujoco.mj_forward(m, d)
        r.update_scene(d)
        frames.append(r.render())
    return frames


def _render_matplotlib(qpos, env, every, width, height):
    """2D x-z projection of every geom, posed by our own kinematics."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Polygon

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ilqg_mujoco_tpu.physics import mjcf, smooth
    from ilqg_mujoco_tpu.physics.model import (GEOM_BOX, GEOM_CAPSULE,
                                               GEOM_PLANE, GEOM_SPHERE)

    m = mjcf.load_model(str(ASSETS / _ASSET[env]))
    idx = np.arange(0, len(qpos), every)
    kin = jax.jit(jax.vmap(lambda q: smooth.kinematics(m, q)))(
        jnp.asarray(qpos[idx]))
    gx = np.asarray(kin.geom_xpos)      # (F, ngeom, 3)
    gm = np.asarray(kin.geom_xmat)      # (F, ngeom, 3, 3)

    allx = gx[:, :, 0]
    lo, hi = allx.min() - 0.8, allx.max() + 0.8
    zlo = min(-0.1, gx[:, :, 2].min() - 0.3)
    zhi = gx[:, :, 2].max() + 0.6

    frames = []
    dpi = 80
    fig, ax = plt.subplots(figsize=(width / dpi, height / dpi), dpi=dpi)
    for f in range(len(idx)):
        ax.clear()
        ax.set_xlim(lo, hi)
        ax.set_ylim(zlo, zhi)
        ax.set_aspect("equal")
        ax.set_title(f"{env}  frame {idx[f]}")
        for g in range(m.ngeom):
            t = int(m.geom_type[g])
            size = m.geom_size[g]
            p = gx[f, g]
            R = gm[f, g]
            if t == GEOM_PLANE:
                ax.axhline(p[2], color="0.4", lw=1.5)
            elif t == GEOM_SPHERE:
                ax.add_patch(Circle((p[0], p[2]), size[0], color="C0",
                                    alpha=0.8))
            elif t == GEOM_CAPSULE:
                a = R[:, 2] * size[1]
                ax.plot([p[0] - a[0], p[0] + a[0]],
                        [p[2] - a[2], p[2] + a[2]],
                        lw=max(2.0, size[0] * 160), color="C1",
                        solid_capstyle="round", alpha=0.9)
            elif t == GEOM_BOX:
                cx = [np.array([sx, 0.0, sz]) for sx in (-size[0], size[0])
                      for sz in (-size[2], size[2])]
                corners = [p + R @ c for c in (cx[0], cx[1], cx[3], cx[2])]
                ax.add_patch(Polygon([(c[0], c[2]) for c in corners],
                                     color="C2", alpha=0.8))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
        frames.append(buf.copy())
    plt.close(fig)
    return frames


def _write(frames, outdir, every):
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    fps = max(1, 60 // every)
    for name in ("replay.mp4", "replay.gif"):   # mp4 needs ffmpeg; gif never
        try:
            import imageio
            imageio.mimsave(outdir / name, frames, fps=fps)
            print("wrote", outdir / name)
            return outdir / name
        except Exception:
            continue
    from PIL import Image
    for i, px in enumerate(frames):
        Image.fromarray(px).save(outdir / f"frame_{i:05d}.png")
    print(f"wrote {len(frames)} PNGs to {outdir}/")
    return outdir / "frame_00000.png"


def replay(npz_path, env, out="frames", every=1, width=480, height=360):
    """Library entry (also used by tests).  Returns the artifact path or
    None (ASCII fallback)."""
    z = np.load(npz_path)
    qpos = z["qpos"]
    if qpos.ndim == 3:        # batched run: replay instance 0
        qpos = qpos[:, 0]
    print(f"trajectory: {qpos.shape[0]} frames, nq={qpos.shape[1]}")
    try:
        frames = _render_mujoco(qpos, env, out, every, width, height)
    except Exception as e:
        print(f"mujoco.Renderer unavailable ({e}); matplotlib 2D fallback")
        try:
            frames = _render_matplotlib(qpos, env, every, width, height)
        except Exception as e2:
            print(f"matplotlib unavailable ({e2}); ASCII summary:")
            for i in range(0, len(qpos), max(1, len(qpos) // 20)):
                print(f"  t={i:5d}  qpos={np.round(qpos[i], 3)}")
            return None
    return _write(frames, out, every)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--env", required=True, choices=list(_ASSET))
    ap.add_argument("--out", default="frames")
    ap.add_argument("--every", type=int, default=1)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    a = ap.parse_args()
    replay(a.npz, a.env, a.out, a.every, a.width, a.height)


if __name__ == "__main__":
    main()
