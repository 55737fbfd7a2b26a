"""FLOP/HBM-byte accounting behind the headline bench number (round-3
verdict weak #2 / next #3): an independent check that the "speed-of-light"
claim is the right KIND of claim for this workload.

Method: XLA's own post-optimization cost model
(`jit(f).lower(...).compile().cost_analysis()`) counts the flops and the
bytes the compiled executable touches — a static count over the final HLO,
so it is exact for the pendulum solve graph (no contact solver ⇒ no
data-dependent while_loop in the hot path; the linesearch/LM while-style
selects are flat selects).  Dividing by the fenced wall time gives achieved
FLOP/s and HBM GB/s, compared against the v5e peaks:

    v5e (lite) per chip:  ~197 TFLOP/s bf16 MXU, ~98 TFLOP/s f32,
                          ~819 GB/s HBM bandwidth

If both fractions are tiny, the program is bound by neither — it is
op-latency/dispatch bound, and the correct scaling lever is MORE INSTANCES
PER PROGRAM (the batch axis), which is exactly the design's claim
(BENCH_NOTES.md round 2).  The point of this tool is to make that argument
quantitative instead of qualitative.

Usage (on the TPU):  python tools/roofline.py
Env knobs: ILQG_BENCH_ENV / ILQG_BENCH_BATCH / ILQG_BENCH_MODE /
ILQG_BENCH_ENGINE / ILQG_BENCH_REPS (as bench.py).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

V5E_PEAK_F32_FLOPS = 98e12     # MXU f32 (bf16 peak is 2x)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9


def main():
    env_name = os.environ.get("ILQG_BENCH_ENV", "pendulum")
    B = int(os.environ.get("ILQG_BENCH_BATCH", "8192"))
    mode = os.environ.get("ILQG_BENCH_MODE", "tassa")
    engine = os.environ.get("ILQG_BENCH_ENGINE", "ad")
    reps = int(os.environ.get("ILQG_BENCH_REPS", "20"))
    trials = int(os.environ.get("ILQG_BENCH_TRIALS", "3"))

    from ilqg_mujoco_tpu.models import envs
    from ilqg_mujoco_tpu.parallel import batch as pbatch

    env = envs.make(env_name, mode=mode, engine=engine)
    chunk = os.environ.get("ILQG_BENCH_CHUNK", "")
    if chunk:
        import dataclasses
        env = dataclasses.replace(env, ilqr=dataclasses.replace(
            env.ilqr, lin=dataclasses.replace(env.ilqr.lin,
                                              chunk_knots=int(chunk))))
    sb, sols = pbatch.init_batched(env, B, qpos_noise=0.01)

    def solve_one(s, sol):
        from ilqg_mujoco_tpu import ilqr
        return ilqr.solve(env.model, env.cost_fn, s, sol, env.ilqr)

    f = jax.vmap(solve_one)
    compiled = jax.jit(f).lower(sb, sols).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    # XLA reports per-operand/output traffic as bytes accessed{} plus
    # per-space entries; take the total
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # chained + value-fetch timing (bench.py round-4 methodology:
    # block_until_ready is not an execution fence on the axon tunnel)
    import jax.numpy as jnp
    out = compiled(sb, sols)
    float(jnp.sum(out[1]))
    best = None
    for _ in range(trials):
        cur = sols
        t0 = time.perf_counter()
        for _ in range(reps):
            cur, traces = compiled(sb, cur)
        float(jnp.sum(traces))
        t = (time.perf_counter() - t0) / reps
        best = t if best is None else min(best, t)

    iters = B * env.ilqr.iterations
    achieved_flops = flops / best
    achieved_bw = bytes_acc / best
    report = {
        "env": env_name, "batch": B, "mode": mode, "engine": engine,
        "per_solve_call": {
            "flops": flops,
            "hbm_bytes_accessed": bytes_acc,
            "flops_per_ilqr_iter": flops / iters,
            "bytes_per_ilqr_iter": bytes_acc / iters,
            "arithmetic_intensity_flop_per_byte": (
                flops / bytes_acc if bytes_acc else None),
        },
        "measured": {
            "time_per_call_s": best,
            "ilqr_iters_per_s": iters / best,
            "achieved_flops_per_s": achieved_flops,
            "achieved_hbm_bytes_per_s": achieved_bw,
        },
        "vs_v5e_peak": {
            "pct_of_f32_mxu_peak": 100.0 * achieved_flops
            / V5E_PEAK_F32_FLOPS,
            "pct_of_hbm_bw_peak": 100.0 * achieved_bw / V5E_HBM_BYTES_S,
        },
        "ridge_point_flop_per_byte_f32": V5E_PEAK_F32_FLOPS / V5E_HBM_BYTES_S,
    }
    print(json.dumps(report, indent=2))
    ai = report["per_solve_call"]["arithmetic_intensity_flop_per_byte"]
    roof = (min(1.0, (ai or 0) / report["ridge_point_flop_per_byte_f32"])
            * V5E_PEAK_F32_FLOPS)
    if roof:
        print(f"# roofline-permitted f32 FLOP/s at this intensity: "
              f"{roof:.3e}; achieved {achieved_flops:.3e} "
              f"({100 * achieved_flops / roof:.2f}% of the roof)")


if __name__ == "__main__":
    main()
