"""Systematic TPU B-sweep with the corrected (chained+value-fetch) fence.

Runs bench.py in a FRESH subprocess per configuration so a tunnel-crashing
config cannot poison the next one, collects the JSON lines, and prints a
markdown table for BENCH_NOTES.md.  Each bench.py invocation itself backs
off its batch on failure (round-5 bench hardening), so a row is recorded
at the largest batch that actually ran.

Usage: python tools/bsweep.py [--env pendulum] [--out sweep.jsonl]
       python tools/bsweep.py --configs '[{"batch": 8192}, ...]'
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

DEFAULT_SWEEP = [
    # production path (tassa+ad): batch scaling along the round-5 feasible
    # frontier (unchunked to 16384; compile-helper bound above, see
    # BENCH_NOTES.md round 5)
    {"batch": 8192},
    {"batch": 16384},
    {"batch": 32768, "chunk": 8},
    {"batch": 65536, "chunk": 4},
    {"batch": 65536, "chunk": 2},     # round-4 config, for the A/B
    # apples-to-apples vs the C core (same algorithm + FD schedule)
    {"batch": 8192, "mode": "compat", "engine": "fd"},
    {"batch": 65536, "mode": "compat", "engine": "fd", "chunk": 4},
]


def run_one(env_name, cfg, reps, trials):
    env = dict(os.environ)
    env["ILQG_BENCH_ENV"] = env_name
    env["ILQG_BENCH_BATCH"] = str(cfg.get("batch", 0))
    env["ILQG_BENCH_REPS"] = str(cfg.get("reps", reps))
    env["ILQG_BENCH_TRIALS"] = str(cfg.get("trials", trials))
    env["ILQG_BENCH_MODE"] = cfg.get("mode", "tassa")
    env["ILQG_BENCH_ENGINE"] = cfg.get("engine", "ad")
    env["ILQG_BENCH_CHUNK"] = str(cfg["chunk"]) if "chunk" in cfg else ""
    # a sweep row should report ITS config, not silently shrink to a
    # smaller batch: disable in-process backoff, treat failure as a row
    env["ILQG_BENCH_BACKOFF"] = cfg.get("backoff", "0")
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=float(cfg.get("timeout", 1500)))
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        row = json.loads(line) if line else {
            "error": (p.stderr or p.stdout)[-300:]}
    except subprocess.TimeoutExpired:
        row = {"error": "timeout"}
    row["config"] = cfg
    row["wall_s"] = round(time.time() - t0, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pendulum")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--configs", default=None,
                    help="JSON list of config dicts (overrides the default "
                         "sweep)")
    args = ap.parse_args()

    sweep = json.loads(args.configs) if args.configs else DEFAULT_SWEEP
    rows = []
    for cfg in sweep:
        row = run_one(args.env, cfg, args.reps, args.trials)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
        time.sleep(3)

    print("\n| B | chunk | mode+engine | iters/s (headline) | "
          "trial min/median/max | note |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        c = r["config"]
        me = f"{c.get('mode','tassa')}+{c.get('engine','ad')}"
        if "error" in r:
            print(f"| {c.get('batch','auto')} | {c.get('chunk','—')} | {me} "
                  f"| FAILED | | {r['error'][:60]} |")
            continue
        s = r.get("spread", {})
        print(f"| {r.get('batch')} | {r.get('chunk_knots') or '—'} | {me} | "
              f"{r['value']:.4g} | {s.get('min', 0):.3g} / "
              f"{s.get('median', 0):.3g} / {s.get('max', 0):.3g} | "
              f"vs_baseline={r.get('vs_baseline')} |")


if __name__ == "__main__":
    main()
