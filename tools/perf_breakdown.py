"""Per-phase performance breakdown on the attached TPU chip (SURVEY.md §5
tracing row; VERDICT round 1, next #3).

Splits one batched iLQR iteration into its three phases — linearize /
backward pass / forward rollout (+linesearch) — with device-fenced timers
(utils/profiling.Timer), and prints a table plus rough arithmetic/HBM
utilization estimates.  Results are recorded in BENCH_NOTES.md.

Usage:
    ILQG_BENCH_ENV=hopper ILQG_BENCH_BATCH=256 python tools/perf_breakdown.py
Env knobs: ILQG_BENCH_ENV, ILQG_BENCH_BATCH, ILQG_BENCH_MODE (tassa|compat),
ILQG_BENCH_ENGINE (ad|fd|exact), ILQG_BENCH_REPS.
"""

import dataclasses
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from ilqg_mujoco_tpu import ilqr  # noqa: E402
from ilqg_mujoco_tpu.models import envs  # noqa: E402
from ilqg_mujoco_tpu.ops.linearize import linearize_traj  # noqa: E402
from ilqg_mujoco_tpu.parallel import batch as pbatch  # noqa: E402
from ilqg_mujoco_tpu.utils.profiling import Timer  # noqa: E402


def main():
    env_name = os.environ.get("ILQG_BENCH_ENV", "hopper")
    B = int(os.environ.get("ILQG_BENCH_BATCH", "256"))
    mode = os.environ.get("ILQG_BENCH_MODE", "tassa")
    engine = os.environ.get("ILQG_BENCH_ENGINE", "ad")
    reps = int(os.environ.get("ILQG_BENCH_REPS", "10"))

    env = envs.make(env_name, mode=mode, engine=engine)
    m, cfg = env.model, env.ilqr
    N = cfg.horizon
    sb, sols = pbatch.init_batched(env, B, qpos_noise=0.01)

    # phase functions, each jitted + vmapped over the batch
    lin_f = jax.jit(jax.vmap(
        lambda sol: linearize_traj(m, sol.traj, env.cost_fn, cfg.lin)))
    if mode == "compat":
        bwd_f = jax.jit(jax.vmap(
            lambda sol, lin: ilqr.backward_pass_compat(m, sol.traj, lin,
                                                       cfg)))
    else:
        bwd_f = jax.jit(jax.vmap(
            lambda sol, lin: ilqr.backward_pass_tassa(
                m, sol.traj, lin, env.cost_fn, sol.mu, cfg)))
    roll_f = jax.jit(jax.vmap(
        lambda s, sol: ilqr.forward_pass(m, s, sol, cfg)))
    ls_f = jax.jit(jax.vmap(
        lambda s, sol: jax.vmap(
            lambda a: ilqr.forward_pass(m, s, sol, cfg, alpha=a))(
                jnp.asarray(cfg.alphas, sol.k.dtype))))
    full_f = jax.jit(jax.vmap(
        lambda s, sol: ilqr.solve(m, env.cost_fn, s, sol, cfg)))

    # warm up (compile)
    lin = lin_f(sols)
    bwd = bwd_f(sols, lin)
    roll = roll_f(sb, sols)
    ls = ls_f(sb, sols)
    full = full_f(sb, sols)
    from ilqg_mujoco_tpu.utils.profiling import fence
    fence((lin, bwd, roll, ls, full))

    t = Timer()
    for _ in range(reps):
        with t.phase("linearize") as box:
            box["out"] = lin_f(sols)
        with t.phase("backward") as box:
            box["out"] = bwd_f(sols, lin)
        with t.phase("rollout_x1") as box:
            box["out"] = roll_f(sb, sols)
        with t.phase(f"linesearch_x{len(cfg.alphas)}") as box:
            box["out"] = ls_f(sb, sols)
        with t.phase(f"full_solve_{cfg.iterations}it") as box:
            box["out"] = full_f(sb, sols)
    t.report()

    # derived estimates -----------------------------------------------------
    nv, nu = m.nv, m.nu
    dev = jax.devices()[0]
    per_lin = t.times["linearize"] / t.counts["linearize"]
    per_full = (t.times[f"full_solve_{cfg.iterations}it"]
                / t.counts[f"full_solve_{cfg.iterations}it"])
    iters_per_s = B * cfg.iterations / per_full

    nefc = 0
    try:
        from ilqg_mujoco_tpu.physics import collision, constraint, smooth
        from ilqg_mujoco_tpu.physics.model import make_state
        s0 = make_state(m)
        kin = smooth.kinematics(m, s0.qpos)
        con = collision.collide(m, kin.geom_xpos, kin.geom_xmat)
        nefc = constraint.make_efc(m, kin, s0.qpos, s0.qvel, con).J.shape[0]
    except Exception:
        pass

    # NOTE on interpretation: per-phase numbers are FENCED separately, so
    # each carries its own dispatch + sync overhead; at these per-instance
    # problem sizes (matrices <= 2nv x 2nv) the separately-fenced phases sum
    # to MORE than the fused whole-solve iteration — evidence the fused
    # program is dominated by on-chip latency, not FLOPs or HBM.  The honest
    # utilization statement lives in BENCH_NOTES.md; a FLOP estimate is not
    # printed because the constraint solver's early-exit while_loop makes
    # static FLOP counts wrong by integer factors.
    print(json.dumps({
        "env": env_name, "batch": B, "mode": mode, "engine": engine,
        "horizon": N, "nv": nv, "nu": nu, "nefc": nefc,
        "device": str(dev),
        "ms_linearize": round(per_lin * 1e3, 3),
        "ms_backward": round(t.times["backward"] / reps * 1e3, 3),
        "ms_rollout": round(t.times["rollout_x1"] / reps * 1e3, 3),
        "ms_linesearch": round(
            t.times[f"linesearch_x{len(cfg.alphas)}"] / reps * 1e3, 3),
        "ms_full_iteration": round(per_full / cfg.iterations * 1e3, 3),
        "us_per_instance_iteration": round(
            per_full / cfg.iterations / B * 1e6, 4),
        "ilqr_iters_per_s": round(iters_per_s, 1),
    }))


if __name__ == "__main__":
    main()
