"""Benchmark: batched iLQR throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: iLQR iterations/s across a batch of independent pendulum
MPC instances (the reference workload, inc/inverted_pendulum/*) on one chip.
Baseline: the reference algorithm's measured single-process throughput on
the MuJoCo C core (tools/measure_baseline.py -> baselines.json); the batch
axis is the TPU scaling story the reference has no counterpart for
(SURVEY.md §2a).

Env knobs: ILQG_BENCH_BATCH (default 65536), ILQG_BENCH_REPS (default 20),
ILQG_BENCH_TRIALS (default 5), ILQG_BENCH_ENV (pendulum|hopper|humanoid),
ILQG_BENCH_MODE (tassa|compat), ILQG_BENCH_ENGINE (ad|fd|exact),
ILQG_BENCH_CHUNK (chunk_knots for the linearizer: bounds the whole-horizon
AD-tangent working set, which pads up to 57x on TPU tiles — unset it
auto-scales: None below B=16384, 2 at/above.  The round-4 B-sweep
(BENCH_NOTES.md) moved the OOM wall from B=16384 to B=131072 and the
headline from 1.27e9 to 8.9e9 iters/s this way).  The
compat+fd combination is the apples-to-apples comparison against the
measured C-core baseline (same algorithm, same FD schedule); the default
tassa+ad is the production path.  Per-phase breakdowns:
tools/perf_breakdown.py.

Methodology (round-4 correction): `jax.block_until_ready` is NOT an
execution fence on this image's axon tunnel — measured: it returns in
~0.05 ms for a 1-GiB elementwise op whose value-fetch timing is ~29 ms
(BENCH_NOTES.md round 4).  The timed region therefore CHAINS the solves
(each call consumes the previous call's solver state, so call k+1 cannot
produce a value before call k executes) and ends with a scalar VALUE fetch
of the last trace, which transitively forces every chained solve to have
actually executed on the device.  Chained solves do the same work as
independent ones (fixed iteration counts, no early exit).  `trials` such
timings are taken; best is reported with the full spread (min-time is the
standard high-variance-environment estimator: noise is strictly additive,
and the tunnel adds seconds-scale stalls when its worker is recovering).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


def main():
    env_name = os.environ.get("ILQG_BENCH_ENV", "pendulum")
    batch = int(os.environ.get("ILQG_BENCH_BATCH", "65536"))
    reps = int(os.environ.get("ILQG_BENCH_REPS", "20"))
    trials = int(os.environ.get("ILQG_BENCH_TRIALS", "5"))
    mode = os.environ.get("ILQG_BENCH_MODE", "tassa")
    engine = os.environ.get("ILQG_BENCH_ENGINE", "ad")
    chunk = os.environ.get("ILQG_BENCH_CHUNK", "")
    # auto policy: big batches chunk the linearizer so AD-tangent temps
    # (tiny trailing dims, up to 57x tile-padding) stay within HBM
    chunk = int(chunk) if chunk else (2 if batch >= 16384 else None)

    from ilqg_mujoco_tpu.models import envs
    from ilqg_mujoco_tpu.parallel import batch as pbatch

    # TPU path default: f32, tassa + AD linearizer; compat+fd reproduces the
    # reference algorithm/FD schedule for apples-to-apples baselining
    env = envs.make(env_name, mode=mode, engine=engine)
    if chunk is not None:
        import dataclasses
        env = dataclasses.replace(env, ilqr=dataclasses.replace(
            env.ilqr, lin=dataclasses.replace(env.ilqr.lin,
                                              chunk_knots=chunk)))

    sb, sols = pbatch.init_batched(env, batch, qpos_noise=0.01)
    solve = pbatch.make_batched_solve(env)

    def timed_chain(n):
        # chained timed region: call k+1 reads call k's solver state, and the
        # final scalar fetch transitively proves every call executed (see
        # module docstring: block_until_ready is not a fence on this tunnel)
        cur = sols
        t0 = time.perf_counter()
        for _ in range(n):
            cur, traces = solve(sb, cur)
        float(jnp.sum(traces))
        return time.perf_counter() - t0

    def timed_run():
        # warm (compile) + force the value path once
        sols2, traces = solve(sb, sols)
        float(jnp.sum(traces))
        # two-point estimator: the value fetch costs a fixed ~26 ms tunnel
        # round-trip regardless of work; timing chains of length n and 2n
        # and differencing eliminates that constant exactly
        t_half = timed_chain(max(reps // 2, 1))
        t_full = timed_chain(reps)
        return t_half, t_full

    # the tunneled TPU occasionally drops a call with a transient
    # UNAVAILABLE device error; retry a few times.  Best-of-`trials` timings
    # (see module docstring for why min-time is the right estimator here);
    # ALL trial timings are kept and reported as a spread so run-to-run
    # tunnel variance is visible instead of hidden (round-3 verdict weak #2).
    times = []
    for attempt in range(3):
        try:
            while len(times) < trials:
                times.append(timed_run())
            break
        except Exception:   # jax.errors.JaxRuntimeError
            if attempt == 2:
                if not times:
                    raise
                break
            time.sleep(5.0)

    half = max(reps // 2, 1)
    rates = []
    for t_half, t_full in times:
        diff = t_full - t_half
        if diff > 0:
            # floor-free per-call estimate from the chain-length difference
            rates.append(batch * env.ilqr.iterations * (reps - half) / diff)
        else:
            # noise swamped the difference: fall back to the full chain
            # including the fetch floor (under-reports; honest direction)
            rates.append(batch * env.ilqr.iterations * reps / t_full)
    rates.sort()
    rate = rates[-1]
    spread = {
        "min": round(rates[0], 2),
        "median": round(rates[len(rates) // 2], 2),
        "max": round(rates[-1], 2),
        "trials": len(rates),
    }

    base_path = pathlib.Path(__file__).parent / "baselines.json"
    vs = None
    if base_path.exists():
        base = json.loads(base_path.read_text())
        ref = base.get(env_name, {}).get("ilqr_iters_per_s")
        if ref:
            vs = rate / ref

    suffix = "" if (mode, engine) == ("tassa", "ad") else f"_{mode}_{engine}"
    print(json.dumps({
        "metric": f"ilqr_iters_per_s_{env_name}_batch{batch}{suffix}",
        "value": round(rate, 2),
        "unit": "iLQR iterations/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "spread": spread,
    }))


if __name__ == "__main__":
    main()
