"""Weak-scaling evidence on the virtual CPU mesh (round-4 verdict next #8).

Measures the sharded batched iLQR solve (parallel/batch.py) over a
1/2/4/8-device mesh of XLA:CPU virtual devices, two ways:

1. **Fixed total batch** (the partition-overhead statement): the same B
   instances solved unsharded vs sharded over n devices.  Instances are
   independent — the only cross-device traffic a correct partitioning emits
   is nothing at all — so sharded time should equal unsharded time.  This
   isolates exactly what a multi-chip deployment adds: partitioning,
   sharding bookkeeping, per-device dispatch.
2. **Fixed per-device batch** (the classic weak-scaling curve): B = n * PB.

Interpretation caveat, printed with the results: this image exposes
**2 physical cores**; virtual devices beyond 2 time-share them, so
wall-clock flatness in curve 2 is physically impossible past n=2 here.
Curve 1 is the load-bearing multi-chip statement this environment can make:
partitioning adds ~zero overhead, so on real chips (each with its own
compute) per-device throughput is conserved.  On-chip numeric correctness
of the sharded program is certified separately (__graft_entry__.py
dryrun_multichip: sharded == unsharded, f32 and f64).

Run:  python tools/weak_scaling.py [--per-device-batch 256] [--reps 10]
Emits one JSON line per measurement + a summary block for BENCH_NOTES.md.
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=1"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def timed_chain(solve, sb, sols, reps):
    """Chained timed region + scalar value fetch (the corrected fence,
    BENCH_NOTES.md round 4; on CPU block_until_ready does fence, but the
    same methodology keeps numbers comparable)."""
    cur = sols
    t0 = time.perf_counter()
    for _ in range(reps):
        cur, traces = solve(sb, cur)
    float(jnp.sum(traces))
    return time.perf_counter() - t0


def measure(env, B, n_devices, reps, trials):
    from ilqg_mujoco_tpu.parallel import batch as pbatch
    mesh = pbatch.make_mesh(n_devices) if n_devices else None
    sb, sols = pbatch.init_batched(env, B, mesh=mesh, qpos_noise=0.01)
    solve = pbatch.make_batched_solve(env, mesh=mesh)
    _, tr = solve(sb, sols)               # compile + settle
    float(jnp.sum(tr))
    return min(timed_chain(solve, sb, sols, reps) for _ in range(trials))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=256)
    ap.add_argument("--total-batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from ilqg_mujoco_tpu.models import envs
    env = envs.make("pendulum", mode="tassa", engine="ad")
    iters = env.ilqr.iterations
    ncores = os.cpu_count()

    print(f"# weak scaling, pendulum tassa+ad, {ncores} physical cores, "
          f"8 virtual devices")

    results = {"fixed_total": [], "fixed_per_device": []}

    # 1. fixed total batch: partition overhead
    B = args.total_batch
    t0 = measure(env, B, 0, args.reps, args.trials)   # unsharded
    for n in (1, 2, 4, 8):
        t = measure(env, B, n, args.reps, args.trials)
        row = {"curve": "fixed_total_B%d" % B, "devices": n,
               "time_s": round(t, 4), "vs_unsharded": round(t / t0, 3),
               "iters_per_s": round(B * iters * args.reps / t, 1)}
        results["fixed_total"].append(row)
        print(json.dumps(row))
    print(json.dumps({"curve": "fixed_total_B%d" % B, "devices": 0,
                      "time_s": round(t0, 4), "vs_unsharded": 1.0,
                      "iters_per_s": round(B * iters * args.reps / t0, 1)}))

    # 2. fixed per-device batch: classic weak scaling (core-bound past
    # n=ncores on this host — see module docstring)
    PB = args.per_device_batch
    base = None
    for n in (1, 2, 4, 8):
        t = measure(env, n * PB, n, args.reps, args.trials)
        base = t if base is None else base
        row = {"curve": "fixed_per_device_PB%d" % PB, "devices": n,
               "batch": n * PB, "time_s": round(t, 4),
               "per_device_time_vs_n1": round(t / base, 3),
               "iters_per_s": round(n * PB * iters * args.reps / t, 1)}
        results["fixed_per_device"].append(row)
        print(json.dumps(row))

    ov = max(r["vs_unsharded"] for r in results["fixed_total"])
    print(f"# partition overhead (max sharded/unsharded at fixed B): "
          f"{(ov - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
