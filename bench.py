"""Benchmark: batched iLQR throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: iLQR iterations/s across a batch of independent pendulum
MPC instances (the reference workload, inc/inverted_pendulum/*) on one chip.
Baseline: the reference algorithm's measured single-process throughput on
the MuJoCo C core (tools/measure_baseline.py -> baselines.json); the batch
axis is the TPU scaling story the reference has no counterpart for
(SURVEY.md §2a).

Env knobs: ILQG_BENCH_BATCH (default per env: pendulum 65536, hopper 8192,
humanoid 64), ILQG_BENCH_REPS (default 20), ILQG_BENCH_TRIALS (default 5),
ILQG_BENCH_ENV (pendulum|hopper|humanoid|tumbler),
ILQG_BENCH_MODE (tassa|compat), ILQG_BENCH_ENGINE (ad|fd|exact),
ILQG_BENCH_CHUNK (chunk_knots for the linearizer: bounds the whole-horizon
AD-tangent working set; unset = auto policy), ILQG_BENCH_BACKOFF (default 1:
on a crash/OOM the batch halves and the bench retries — it NEVER exits
non-zero once any batch has produced a measurement).  The compat+fd
combination is the apples-to-apples comparison against the measured C-core
baseline (same algorithm, same FD schedule); the default tassa+ad is the
production path.  Per-phase breakdowns: tools/perf_breakdown.py.

Methodology (round-4 correction, round-5 estimator fix):
`jax.block_until_ready` is NOT an execution fence on this image's axon
tunnel — measured: it returns in ~0.05 ms for a 1-GiB elementwise op whose
value-fetch timing is ~29 ms (BENCH_NOTES.md round 4).  The timed region
therefore CHAINS the solves (each call consumes the previous call's solver
state, so call k+1 cannot produce a value before call k executes) and ends
with a scalar VALUE fetch of the last trace, which transitively forces
every chained solve to have actually executed on the device.  Chained
solves do the same work as independent ones (fixed iteration counts, no
early exit).

The value fetch costs a fixed ~26 ms tunnel round-trip regardless of work;
chains of length n and 2n are timed and differenced to eliminate that
constant.  Round-5 estimator fix (advisor finding): differencing per-TRIAL
and taking the max rate is upward-biased — a tunnel stall inside the SHORT
chain shrinks the difference and inflates that trial unboundedly, and the
max selects exactly those corrupted trials.  Noise on this tunnel is
strictly additive per *timing*, so the minimum of each chain length across
trials is the clean estimate of that chain's true cost; the headline is
  rate = work_delta / (min_trials(t_full) - min_trials(t_half)).
Per-trial rates are still computed for the reported spread, but the
headline comes from the minima difference.
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

# per-env default batch.  Round-5 re-tune under the corrected fence: the
# measured per-call cost is ~LINEAR in B (aggregate throughput is flat in
# B — per-op overhead/padding-bound at these tiny-trailing-dim layouts,
# BENCH_NOTES round 5), so large batches multiply bench wall time without
# raising the headline; B=4096 measures the same rate in minutes.
DEFAULT_BATCH = {"pendulum": 4096, "hopper": 1024, "humanoid": 16,
                 "tumbler": 1024}
MIN_BATCH = {"pendulum": 256, "hopper": 64, "humanoid": 4, "tumbler": 64}


def auto_chunk(env_name: str, batch: int):
    """chunk_knots policy, re-tuned after the round-5 component-form
    rewrite removed the 57x tile padding: HBM no longer binds at these
    batches; the remaining ceiling is the tunnel's tpu_compile_helper,
    which crashes (deterministically) on fused linearizations above
    ~350k knot-instances (BENCH_NOTES.md round 5).  Policy keeps
    batch*chunk safely under that boundary."""
    if env_name == "pendulum":
        if batch <= 16384:
            return None                  # whole-horizon, unchunked
        return 8 if batch <= 32768 else 4
    if env_name == "humanoid":
        return 8
    return 8 if batch >= 4096 else None


def build(env_name, mode, engine, batch, chunk):
    from ilqg_mujoco_tpu.models import envs
    from ilqg_mujoco_tpu.parallel import batch as pbatch

    env = envs.make(env_name, mode=mode, engine=engine)
    if chunk is not None:
        import dataclasses
        env = dataclasses.replace(env, ilqr=dataclasses.replace(
            env.ilqr, lin=dataclasses.replace(env.ilqr.lin,
                                              chunk_knots=chunk)))
    sb, sols = pbatch.init_batched(env, batch, qpos_noise=0.01)
    solve = pbatch.make_batched_solve(env)
    return env, sb, sols, solve


def measure(env, sb, sols, solve, batch, reps, trials):
    """Timed chains at two lengths; minima-differenced headline + per-trial
    spread.  Raises on device failure — the caller backs off the batch."""
    def timed_chain(n):
        cur = sols
        t0 = time.perf_counter()
        for _ in range(n):
            cur, traces = solve(sb, cur)
        float(jnp.sum(traces))          # the real fence (see module doc)
        return time.perf_counter() - t0

    # warm (compile) + force the value path once
    _, traces = solve(sb, sols)
    float(jnp.sum(traces))

    half = max(reps // 2, 1)
    t_halves, t_fulls = [], []
    for _ in range(trials):
        t_halves.append(timed_chain(half))
        t_fulls.append(timed_chain(reps))

    work_per_call = batch * env.ilqr.iterations
    diff = min(t_fulls) - min(t_halves)
    if diff > 0:
        rate = work_per_call * (reps - half) / diff
    else:
        # noise swamped the difference: full chain incl. the fetch floor
        # (under-reports; honest direction)
        rate = work_per_call * reps / min(t_fulls)

    # per-trial rates, for spread visibility only (NOT the headline —
    # per-trial differencing is upward-biased, see module docstring)
    per_trial = []
    for th, tf in zip(t_halves, t_fulls):
        d = tf - th
        per_trial.append(work_per_call * (reps - half) / d if d > 0
                         else work_per_call * reps / tf)
    per_trial.sort()
    spread = {
        "min": round(per_trial[0], 2),
        "median": round(per_trial[len(per_trial) // 2], 2),
        "max": round(per_trial[-1], 2),
        "trials": len(per_trial),
        "estimator": "minima-differenced",
    }
    return rate, spread


def main():
    env_name = os.environ.get("ILQG_BENCH_ENV", "pendulum")
    batch = int(os.environ.get("ILQG_BENCH_BATCH", "0")) or \
        DEFAULT_BATCH.get(env_name, 8192)
    reps = int(os.environ.get("ILQG_BENCH_REPS", "4"))
    trials = int(os.environ.get("ILQG_BENCH_TRIALS", "3"))
    mode = os.environ.get("ILQG_BENCH_MODE", "tassa")
    engine = os.environ.get("ILQG_BENCH_ENGINE", "ad")
    chunk_env = os.environ.get("ILQG_BENCH_CHUNK", "")
    backoff = os.environ.get("ILQG_BENCH_BACKOFF", "1") != "0"
    min_batch = MIN_BATCH.get(env_name, 256)

    # batch backoff ladder: a tunnel crash or OOM at batch B retries at B/2.
    # The bench must ALWAYS print its JSON line once anything has run
    # (round-4 verdict: "a bench that can fail to print a number is not a
    # bench").
    result, errors = None, []
    while True:
        chunk = int(chunk_env) if chunk_env else auto_chunk(env_name, batch)
        try:
            env, sb, sols, solve = build(env_name, mode, engine, batch, chunk)
            rate, spread = measure(env, sb, sols, solve, batch, reps, trials)
            result = (env, batch, chunk, rate, spread)
            break
        except Exception as e:           # noqa: BLE001 — any device failure
            errors.append(f"B={batch}: {type(e).__name__}: {str(e)[:200]}")
            if not backoff or batch // 2 < min_batch:
                break
            batch //= 2
            time.sleep(5.0)              # let the tunnel worker recover

    base_path = pathlib.Path(__file__).parent / "baselines.json"
    base = json.loads(base_path.read_text()) if base_path.exists() else {}
    ref = base.get(env_name, {}).get("ilqr_iters_per_s")

    suffix = "" if (mode, engine) == ("tassa", "ad") else f"_{mode}_{engine}"
    if result is not None:
        env, batch, chunk, rate, spread = result
        line = {
            "metric": f"ilqr_iters_per_s_{env_name}_batch{batch}{suffix}",
            "value": round(rate, 2),
            "unit": "iLQR iterations/s/chip",
            "vs_baseline": round(rate / ref, 2) if ref else None,
            "spread": spread,
            "batch": batch,
            "chunk_knots": chunk,
        }
        if errors:
            line["backoff_from"] = errors
        print(json.dumps(line))
        return 0
    # nothing ran at any batch: still print the line (value 0 is the honest
    # "no throughput demonstrated") and exit 0 so the record exists
    print(json.dumps({
        "metric": f"ilqr_iters_per_s_{env_name}{suffix}",
        "value": 0,
        "unit": "iLQR iterations/s/chip",
        "vs_baseline": None,
        "errors": errors,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
