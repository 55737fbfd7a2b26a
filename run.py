"""CLI runner: the analog of the reference's `./bin/base <model.xml>`
(/root/reference/cmd/basic.cpp) without the GLFW window — runs MPC (or a
single solve), reports progress, and dumps trajectories + cost traces to npz
for offline replay/rendering (SURVEY.md §2b.4: the viewer is replaced by
artifact dump + host-side replay).

Examples:
  python run.py pendulum --frames 100
  python run.py pendulum --solve-only
  python run.py hopper --frames 200 --mode tassa --engine ad --out hop.npz
  python run.py tumbler --frames 20                     # nq!=nv env
  python run.py pendulum --backward assoc --solve-only  # parallel Riccati
  python run.py pendulum --batch 256 --frames 50        # batched MPC
  python run.py pendulum --batch 256 --mesh 4           # sharded over mesh
  python run.py hopper --frames 50 --checkpoint ck.npz  # save at the end
  python run.py hopper --frames 50 --resume ck.npz      # continue from it
  python run.py --platform cpu pendulum --frames 10     # force CPU
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    # env names are validated against envs.REGISTRY after the (lazy) jax
    # import so the CLI surface can never drift from the library's
    ap.add_argument("env", help="environment name (see models/envs.REGISTRY:"
                                " pendulum|hopper|humanoid|tumbler)")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--mode", choices=["compat", "tassa"], default=None)
    ap.add_argument("--engine", choices=["fd", "ad", "exact"], default=None)
    ap.add_argument("--backward", choices=["scan", "assoc"], default=None,
                    help="Riccati backward executor: sequential scan or "
                         "associative-scan (O(log N) depth) parallel form")
    ap.add_argument("--solve-only", action="store_true",
                    help="run one iLQR solve and print the cost trace")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the batch over the first N devices "
                         "(data-parallel Mesh; requires --batch > 1)")
    ap.add_argument("--segment-frames", type=int, default=None,
                    help="compile one k-frame program and drive it from a "
                         "host loop (bounds XLA program size on huge runs)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="write (env state, solver state) npz after the run")
    ap.add_argument("--resume", type=str, default=None,
                    help="resume from a --checkpoint npz (skips warm-in)")
    ap.add_argument("--platform", type=str, default=None,
                    help="jax platform override (e.g. cpu)")
    ap.add_argument("--x64", action="store_true", help="enable float64")
    ap.add_argument("--horizon", type=int, default=None,
                    help="override solver horizon N")
    ap.add_argument("--iters", type=int, default=None,
                    help="override iLQR iterations per solve")
    ap.add_argument("--control-limits", action="store_true",
                    help="control-limited iLQG (boxQP backward pass; "
                         "respects actuator ctrlrange)")
    ap.add_argument("--value-scaling", action="store_true",
                    help="overflow-free scaled value recursion (long "
                         "stiff-contact horizons in f32)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from ilqg_mujoco_tpu import ilqr, mpc
    from ilqg_mujoco_tpu.models import envs
    from ilqg_mujoco_tpu.utils import checkpoint

    if args.env not in envs.REGISTRY:
        ap.error(f"unknown env {args.env!r}; available: "
                 f"{', '.join(sorted(envs.REGISTRY))}")

    kw = {}
    if args.mode:
        kw["mode"] = args.mode
    if args.engine:
        kw["engine"] = args.engine
    env = envs.make(args.env, **kw)
    import dataclasses
    over = {}
    if args.horizon:
        over["horizon"] = args.horizon
    if args.iters:
        over["iterations"] = args.iters
    if args.backward:
        over["backward"] = args.backward
    if args.control_limits:
        over["control_limits"] = True
    if args.value_scaling:
        over["value_scaling"] = True
    if over:
        env = dataclasses.replace(env,
                                  ilqr=dataclasses.replace(env.ilqr, **over))
    print(f"env={env.name} mode={env.ilqr.mode} engine={env.ilqr.lin.engine} "
          f"backward={env.ilqr.backward} "
          f"N={env.ilqr.horizon} iters={env.ilqr.iterations} "
          f"devices={jax.devices()}")

    if args.solve_only:
        s0, sol0 = mpc.init(env)
        f = jax.jit(lambda s, so: ilqr.solve(
            env.model, env.cost_fn, s, so, env.ilqr))
        t0 = time.perf_counter()
        sol, trace = jax.block_until_ready(f(s0, sol0))
        print(f"solve (incl. compile): {time.perf_counter()-t0:.2f}s")
        t0 = time.perf_counter()
        sol, trace = jax.block_until_ready(f(s0, sol0))
        print(f"solve (steady): {(time.perf_counter()-t0)*1e3:.1f}ms")
        print("cost trace:", np.asarray(trace))
        return

    if args.batch > 1:
        from ilqg_mujoco_tpu.parallel import batch as pbatch
        mesh = pbatch.make_mesh(args.mesh) if args.mesh else None
        if mesh is not None:
            print(f"mesh: {args.mesh} devices, data-parallel batch sharding")
        sb, sols = pbatch.init_batched(env, args.batch, mesh=mesh,
                                       qpos_noise=0.01)
        stepf = pbatch.make_batched_mpc_step(env, mesh=mesh)
        t0 = time.perf_counter()
        costs_hist = []
        for i in range(args.frames):
            sb, sols, costs = stepf(sb, sols)
            costs_hist.append(costs)
        jax.block_until_ready(costs)
        dt = time.perf_counter() - t0
        print(f"{args.frames} frames x {args.batch} instances: {dt:.2f}s "
              f"({args.frames*args.batch/dt:.0f} env-frames/s)")
        print("mean step cost (last frame):",
              float(jnp.mean(costs_hist[-1])))
        if args.out:
            np.savez(args.out, qpos=np.asarray(sb.qpos),
                     costs=np.asarray(jnp.stack(costs_hist)))
            print("wrote", args.out)
        return

    x0 = sol0 = None
    if args.resume:
        x0, sol0, extra = checkpoint.load(args.resume)
        print(f"resumed from {args.resume} (t={float(x0.time):.3f})")

    t0 = time.perf_counter()
    if args.segment_frames:
        # host-segmented: bounded program size; must run un-jitted
        out = mpc.run(env, args.frames, x0=x0, sol0=sol0,
                      segment_frames=args.segment_frames)
    else:
        out = jax.jit(lambda: mpc.run(env, args.frames, x0=x0, sol0=sol0))()
    jax.block_until_ready(out.step_cost)
    dt = time.perf_counter() - t0
    print(f"{args.frames} MPC frames in {dt:.2f}s (incl. compile)")
    qpos = np.asarray(out.env_states.qpos)
    print("final qpos:", qpos[-1].round(4))
    print("mean step cost:", float(np.mean(np.asarray(out.step_cost))))
    if args.checkpoint:
        checkpoint.save(args.checkpoint, out.final_state, out.final_sol,
                        extra={"frames": args.frames})
        print("checkpointed to", args.checkpoint)
    if args.out:
        np.savez(args.out, qpos=qpos, qvel=np.asarray(out.env_states.qvel),
                 ctrl=np.asarray(out.controls),
                 cost_trace=np.asarray(out.cost_trace),
                 step_cost=np.asarray(out.step_cost))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
