"""Pallas TPU kernel: fused batched compat-Riccati backward pass (nu=1).

STATUS (round-5, REVISED under the corrected fence): EXPERIMENTAL scope
(nu=1) but measured FASTER than every XLA alternative for the backward
pass.  Corrected-fence numbers (tools/pallas_bench.py, B=8192, f32):
kernel 1.12 ms vs isolated XLA scan 10.83 ms — 9.65x.  The round-3 claim
that in-situ whole-solve fusion was ~100x faster than this kernel was an
artifact of the non-fencing block_until_ready (it timed dispatch, not
execution; the real whole solve is ~2 s/iteration at this batch —
BENCH_NOTES.md round 5).  The batch-on-lanes layout (instances on lanes,
matrix elements as separate tiles) is the measured direction for the
whole solve path; the round-5 component-form rewrite of
physics/spatial.py applies the same principle inside XLA fusion.

The backward recursion (ilqr.backward_pass_compat — the reference algorithm,
/root/reference/inc/ilqr.h:133-176) is a reverse scan whose per-step math is
tiny dense algebra (n = 2nv <= 8 for the reference's complete env).  Under
`vmap` XLA executes it as a while-loop whose carry and per-step inputs
round-trip HBM each step in (batch, n, n) layouts where the minor dims are
the TINY matrix dims — padded onto (8,128) vector tiles.

This kernel instead:

* lays the batch out on the vector unit: each matrix ELEMENT is a
  (8, 128)-shaped tile of 1024 independent problem instances, so every
  scalar operation of the unrolled recursion is one full-utilization VPU op;
* keeps the value-function carry (V, v) entirely in VMEM/registers across
  all N steps — zero HBM carry traffic;
* runs the whole horizon in one kernel launch per 1024-instance tile
  (grid over batch tiles; the horizon is a fori_loop inside the kernel).

Scope: nu = 1 (the gain solve is a vector-lane division; nu > 1 needs a
boxed Cholesky and buys nothing for the reference's shipped env — pendulum
is nu=1, /root/reference/inc/inverted_pendulum/inverted_pendulum.h:21).
Exactly matches `backward_pass_compat`'s math, quirks included (LM shift
never removed, v-reads-new-V aliasing, rank-1 Hessians).

Measured comparison vs the XLA scan path lives in BENCH_NOTES.md
(tools/pallas_bench.py); correctness: tests/test_pallas_riccati.py
(interpret mode on CPU, device mode on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES          # instances per grid cell


def _kernel(A_ref, B_ref, q_ref, r_ref, c_ref, v0_ref, mu_ref,
            K_ref, k_ref, *, N: int, n: int):
    """One batch tile: the full N-step reverse recursion.

    Refs (VMEM), leading dims all static except the time index:
      A  (N, n, n, 8, 128)    Euler-discretized state Jacobians
      B  (N, n, 8, 128)       control Jacobian column (nu = 1)
      q  (N, n, 8, 128)       cost gradient wrt x per knot
      r  (N, 8, 128)          cost gradient wrt u per knot
      c  (N, n, 8, 128)       knot gaps x*_{t+1} - x*_t
      v0 (n, 8, 128)          terminal cost gradient (initV)
      mu (1, 1)               SMEM scalar LM shift
    Outs:
      K  (N, n, 8, 128)       feedback row (nu = 1)
      k  (N, 8, 128)          feedforward
    """
    mu = mu_ref[0, 0]

    # initV (inc/ilqr.h:100-107): v = dgdx(terminal), V = v^T v
    v = [v0_ref[i] for i in range(n)]                    # list of (8,128)
    V = [[v[i] * v[j] for j in range(n)] for i in range(n)]

    def step(it, carry):
        V, v = carry                                     # (n,n,8,128),(n,8,128)
        t = N - 1 - it
        At = A_ref[t]                                    # (n, n, 8, 128)
        Bt = B_ref[t]
        qt = q_ref[t]
        rt = r_ref[t]
        ct = c_ref[t]
        Vl = [[0.5 * (V[i, j] + V[j, i]) + (mu if i == j else 0.0)
               for j in range(n)] for i in range(n)]
        vl = [v[i] for i in range(n)]
        A = [[At[i, j] for j in range(n)] for i in range(n)]
        Bc = [Bt[i] for i in range(n)]
        q = [qt[i] for i in range(n)]
        c = [ct[i] for i in range(n)]
        R = rt * rt

        # W = V @ A ; negT = 2 B^T V B + 2 R (scalar lane-wise)
        W = [[sum(Vl[i][l] * A[l][j] for l in range(n)) for j in range(n)]
             for i in range(n)]
        BtVB = sum(Bc[i] * sum(Vl[i][j] * Bc[j] for j in range(n))
                   for i in range(n))
        invT = 1.0 / (2.0 * BtVB + 2.0 * R)
        # K = T^-1 (2 B^T V A), k = T^-1 (B^T (v + 2 V c) + r), T = -negT
        Kt = [-invT * 2.0 * sum(Bc[i] * W[i][j] for i in range(n))
              for j in range(n)]
        Vc = [sum(Vl[i][j] * c[j] for j in range(n)) for i in range(n)]
        kt = -invT * (sum(Bc[i] * (vl[i] + 2.0 * Vc[i]) for i in range(n))
                      + rt)

        ABK = [[A[i][j] + Bc[i] * Kt[j] for j in range(n)] for i in range(n)]
        # V_new = ABK^T V ABK + q q^T + K^T R K
        P = [[sum(Vl[i][l] * ABK[l][j] for l in range(n)) for j in range(n)]
             for i in range(n)]
        Vn = [[sum(ABK[l][i] * P[l][j] for l in range(n))
               + q[i] * q[j] + Kt[i] * R * Kt[j]
               for j in range(n)] for i in range(n)]
        # v_new = 2 (B k + c)^T V_new ABK + v ABK + q + 2 k R K
        # (reads the NEW V — the reference's aliasing, inc/ilqr.h:173-174)
        w = [Bc[i] * kt + c[i] for i in range(n)]
        y = [sum(w[i] * Vn[i][j] for i in range(n)) for j in range(n)]
        vn = [2.0 * sum(y[i] * ABK[i][j] for i in range(n))
              + sum(vl[i] * ABK[i][j] for i in range(n))
              + q[j] + 2.0 * kt * R * Kt[j]
              for j in range(n)]

        K_ref[t] = jnp.stack(Kt)
        k_ref[t] = kt
        return (jnp.stack([jnp.stack(row) for row in Vn]), jnp.stack(vn))

    jax.lax.fori_loop(
        0, N, step,
        (jnp.stack([jnp.stack(row) for row in V]), jnp.stack(v)))


def _pack(x, G):
    """(Bt, N, ...) -> (N, ..., G, 8, 128): batch onto the vector tile."""
    xt = jnp.moveaxis(x, 0, -1)                    # (N, ..., Bt)
    return xt.reshape(xt.shape[:-1] + (G, SUBLANES, LANES))


def _unpack(y):
    """(N, ..., G, 8, 128) -> (Bt, N, ...)."""
    yf = y.reshape(y.shape[:-3] + (-1,))
    return jnp.moveaxis(yf, -1, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def backward_compat_batched(A, B, gx, gu, diffs, mu, *, interpret=False):
    """Batched reference backward pass as one fused Pallas program.

    Args (batch-major, matching ``vmap(backward_pass_compat)`` data):
      A     (Bt, N, n, n)   discrete state Jacobians, knots 0..N-1
      B     (Bt, N, n, 1)   control Jacobians (nu = 1)
      gx    (Bt, N+1, n)    cost gradients (gx[:, N] is the terminal initV)
      gu    (Bt, N, 1)      cost ctrl-gradients
      diffs (Bt, N, n)      knot gaps x*_{t+1} - x*_t
      mu    scalar          fixed LM shift (inc/ilqr.h:65)

    Returns (K, k): (Bt, N, 1, n), (Bt, N, 1) — terminal gains (which the
    reference never uses) are NOT appended; callers pad zeros like
    backward_pass_compat does.
    """
    Bt, N, n, nu = B.shape
    assert nu == 1, "pallas backward kernel supports nu=1 (pendulum-class)"
    dt = A.dtype
    pad = (-Bt) % TILE
    if pad:
        def padfn(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        # gu pads with ONES: zero lanes make invT = 1/(2 B^T V B + 2 r^2)
        # divide by zero, so padded lanes would carry inf/nan through the
        # whole recursion — harmless to the sliced-off outputs but it trips
        # jax_debug_nans and would corrupt any future cross-lane reduction
        A, B, gx, diffs = map(padfn, (A, B, gx, diffs))
        gu = padfn(gu, 1.0)
    G = (Bt + pad) // TILE

    Ap = _pack(A, G)                               # (N,n,n,G,8,128)
    Bp = _pack(B[..., 0], G)                       # (N,n,G,8,128)
    qp = _pack(gx[:, :N], G)                       # (N,n,G,8,128)
    rp = _pack(gu[..., 0], G)                      # (N,G,8,128)
    cp = _pack(diffs, G)                           # (N,n,G,8,128)
    v0p = _pack(gx[:, N], G)                       # (n,G,8,128)
    mu2 = jnp.asarray(mu, dt).reshape(1, 1)

    def spec(*block):
        # grid axis g selects the batch tile; everything else is whole
        nlead = len(block)
        return pl.BlockSpec(
            block + (1, SUBLANES, LANES),
            lambda g, _n=nlead: (0,) * _n + (g, 0, 0),
            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((N, n, G, SUBLANES, LANES), dt),   # K
        jax.ShapeDtypeStruct((N, G, SUBLANES, LANES), dt),      # k
    )
    kern = functools.partial(_squeeze_kernel, N=N, n=n)
    Kp, kp = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            spec(N, n, n), spec(N, n), spec(N, n), spec(N),
            spec(N, n), spec(n),
            pl.BlockSpec((1, 1), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[spec(N, n), spec(N)],
        out_shape=out_shape,
        interpret=interpret,
    )(Ap, Bp, qp, rp, cp, v0p, mu2)

    K = _unpack(Kp)[:Bt]                           # (Bt, N, n)
    k = _unpack(kp)[:Bt]                           # (Bt, N)
    return K[:, :, None, :], k[:, :, None]


def _squeeze_kernel(A_ref, B_ref, q_ref, r_ref, c_ref, v0_ref, mu_ref,
                    K_ref, k_ref, *, N, n):
    """Adapter: BlockSpecs keep the size-1 grid axis; present refs to the
    math kernel with that axis squeezed via indexers."""
    class _Sq:
        def __init__(self, ref, lead):
            self.ref = ref
            self.lead = lead        # number of leading dims before g-axis

        def __getitem__(self, idx):
            if not isinstance(idx, tuple):
                idx = (idx,)
            return self.ref[idx + (slice(None),) * (self.lead - len(idx))
                            + (0,)]

        def __setitem__(self, idx, val):
            if not isinstance(idx, tuple):
                idx = (idx,)
            full = idx + (slice(None),) * (self.lead - len(idx)) + (0,)
            self.ref[full] = val

    _kernel(_Sq(A_ref, 3), _Sq(B_ref, 2), _Sq(q_ref, 2), _Sq(r_ref, 1),
            _Sq(c_ref, 2), _Sq(v0_ref, 1), mu_ref,
            _Sq(K_ref, 2), _Sq(k_ref, 1), N=N, n=n)
