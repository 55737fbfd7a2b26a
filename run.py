"""CLI runner: the analog of the reference's `./bin/base <model.xml>`
(/root/reference/cmd/basic.cpp) without the GLFW window — runs MPC (or a
single solve), reports progress, and dumps trajectories + cost traces to npz
for offline replay/rendering (SURVEY.md §2b.4: the viewer is replaced by
artifact dump + host-side replay).

Examples:
  python run.py pendulum --frames 100
  python run.py pendulum --solve-only
  python run.py hopper --frames 200 --mode tassa --engine ad --out hop.npz
  python run.py pendulum --batch 256 --frames 50        # batched MPC
  python run.py --platform cpu pendulum --frames 10     # force CPU
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("env", choices=["pendulum", "hopper", "humanoid"])
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--mode", choices=["compat", "tassa"], default=None)
    ap.add_argument("--engine", choices=["fd", "ad", "exact"], default=None)
    ap.add_argument("--solve-only", action="store_true",
                    help="run one iLQR solve and print the cost trace")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", type=str, default=None)
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
    if args.control_limits:
        over["control_limits"] = True
    if args.value_scaling:
        over["value_scaling"] = True
    if over:
        env = dataclasses.replace(env,
                                  ilqr=dataclasses.replace(env.ilqr, **over))
    print(f"env={env.name} mode={env.ilqr.mode} engine={env.ilqr.lin.engine} "
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
        sb, sols = pbatch.init_batched(env, args.batch, qpos_noise=0.01)
        stepf = pbatch.make_batched_mpc_step(env)
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

    t0 = time.perf_counter()
    out = jax.jit(lambda: mpc.run(env, args.frames))()
    jax.block_until_ready(out.step_cost)
    dt = time.perf_counter() - t0
    print(f"{args.frames} MPC frames in {dt:.2f}s (incl. compile)")
    qpos = np.asarray(out.env_states.qpos)
    print("final qpos:", qpos[-1].round(4))
    print("mean step cost:", float(np.mean(np.asarray(out.step_cost))))
    if args.out:
        np.savez(args.out, qpos=qpos, qvel=np.asarray(out.env_states.qvel),
                 ctrl=np.asarray(out.controls),
                 cost_trace=np.asarray(out.cost_trace),
                 step_cost=np.asarray(out.step_cost))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
