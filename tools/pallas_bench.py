"""Micro-benchmark: Pallas fused backward pass vs the XLA scan path (TPU).

Times the batched compat-Riccati backward pass both ways on identical data
(pendulum dims: n=4, nu=1, N=20) and checks they agree on-device.  Results
are recorded in BENCH_NOTES.md; the faster path is a measurement, not an
assumption (the XLA while-loop pays HBM carry traffic per step and tiny-dim
tile padding; the kernel pays explicit layout transposes at entry/exit).

Usage: python tools/pallas_bench.py   [ILQG_BENCH_BATCH=8192] [REPS=50]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ilqg_mujoco_tpu import ilqr  # noqa: E402
from ilqg_mujoco_tpu.models import envs  # noqa: E402
from ilqg_mujoco_tpu.ops.linearize import linearize_traj  # noqa: E402
from ilqg_mujoco_tpu.experimental.pallas_riccati import backward_compat_batched  # noqa: E402
from ilqg_mujoco_tpu.physics.model import make_state  # noqa: E402


def main():
    B = int(os.environ.get("ILQG_BENCH_BATCH", "8192"))
    reps = int(os.environ.get("REPS", "50"))
    env = envs.pendulum()
    m, cfg = env.model, env.ilqr
    N = cfg.horizon

    # real linearization data from one instance, batch-perturbed so every
    # lane carries distinct values
    s0 = make_state(m).replace(qpos=jnp.asarray([0.05, 0.2]))
    sol = ilqr.init_solver(m, s0, cfg)
    traj = ilqr.forward_pass(m, s0, sol, cfg)
    lin = linearize_traj(m, traj, env.cost_fn, cfg.lin)
    d = jnp.concatenate([traj.qpos[1:] - traj.qpos[:-1],
                         traj.qvel[1:] - traj.qvel[:-1]], axis=1)
    key = jax.random.PRNGKey(0)
    jit = lambda x: jnp.asarray(x, jnp.float32)

    def batchify(x, k):
        noise = 1e-3 * jax.random.normal(k, (B,) + x.shape, jnp.float32)
        return jit(x)[None] + noise

    ks = jax.random.split(key, 5)
    A_b = batchify(lin.A[:N], ks[0])
    B_b = batchify(lin.B[:N], ks[1])
    gx_b = batchify(lin.gx, ks[2])
    gu_b = batchify(lin.gu[:N], ks[3])
    d_b = batchify(d, ks[4])

    # ---- XLA scan path: vmapped backward_pass_compat core ----------------
    def scan_one(A, Bc, gx, gu, diffs):
        mu = jnp.asarray(cfg.mu, A.dtype)
        n2 = A.shape[-1]
        v0 = gx[N]
        V0 = jnp.outer(v0, v0)

        from ilqg_mujoco_tpu.ops import linalg

        def body(carry, inp):
            V, v = carry
            At, Bt, q, r, c = inp
            V = 0.5 * (V + V.T)
            Q = jnp.outer(q, q)
            R = jnp.outer(r, r)
            V = V + mu * jnp.eye(n2, dtype=A.dtype)
            negT = 2.0 * Bt.T @ V @ Bt + 2.0 * R
            Lt = linalg.cholesky(negT)
            K = -linalg.cho_solve(Lt, 2.0 * Bt.T @ V @ At)
            k = -linalg.cho_solve(Lt, Bt.T @ (v + 2.0 * V @ c) + r)
            ABK = At + Bt @ K
            V_new = ABK.T @ V @ ABK + Q + K.T @ R @ K
            v_new = (2.0 * (Bt @ k + c) @ V_new @ ABK + v @ ABK + q
                     + 2.0 * (k @ R @ K))
            return (V_new, v_new), (K, k)

        xs = (A, Bc, gx[:N], gu, diffs)
        _, (K, k) = jax.lax.scan(body, (V0, v0), xs, reverse=True)
        return K, k

    scan_f = jax.jit(jax.vmap(scan_one))
    pallas_f = jax.jit(lambda *a: backward_compat_batched(*a, cfg.mu))

    args = (A_b, B_b, gx_b, gu_b, d_b)
    Ks, ks_ = scan_f(*args)
    Kp, kp = pallas_f(*args)
    from ilqg_mujoco_tpu.utils.profiling import fence
    fence((Ks, Kp))
    scale = float(jnp.max(jnp.abs(Ks)))
    err = jnp.abs(Kp - Ks) / scale
    print(f"on-device K agreement (relative to max|K|={scale:.1f}): "
          f"median {float(jnp.median(err)):.2e}  max {float(jnp.max(err)):.2e}"
          "  (f32 summation-order spread of the ill-conditioned compat "
          "recursion; the math is identical — interpret-mode f64 matches "
          "to 1e-14, tests/test_pallas_riccati.py)")

    def timeit(f):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*args)
            fence(out)   # value-fetch fence: block_until_ready is not an
                         # execution fence on the axon tunnel (BENCH_NOTES)
            t = (time.perf_counter() - t0) / reps
            best = t if best is None else min(best, t)
        return best

    t_scan = timeit(scan_f)
    t_pal = timeit(pallas_f)
    print(f"B={B} N={N}: scan {t_scan*1e3:.3f} ms   "
          f"pallas {t_pal*1e3:.3f} ms   speedup x{t_scan/t_pal:.2f}")


if __name__ == "__main__":
    main()
