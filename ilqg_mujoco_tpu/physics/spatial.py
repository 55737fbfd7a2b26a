"""Quaternion / rotation / spatial-vector algebra for the TPU physics core.

Conventions
-----------
* Quaternions are MuJoCo order ``(w, x, y, z)``.
* Spatial (Plücker) motion vectors are angular-first: ``V = (omega, v_o)``
  where ``v_o`` is the linear velocity of the body-fixed point instantaneously
  located at the world origin.
* Spatial force (wrench) vectors are ``F = (n_o, f)`` — torque about the world
  origin first, then linear force.

All functions are pure jnp and batch-friendly (leading dims broadcast).

The reference implementation delegates all of this to MuJoCo's C core
(``mju_*`` functions, used e.g. at /root/reference/src/mjderivative.cpp:163-171);
here it is re-implemented as vectorizable JAX ops so the whole dynamics
pipeline can be traced, vmapped and compiled by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# quaternions (w, x, y, z)
# --------------------------------------------------------------------------

def quat_mul(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q ⊗ p (both (…,4), MuJoCo wxyz order)."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (R(q) @ v)."""
    qw, qv = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix (…,3,3).

    Assembled as row stacks, NOT stack(…,9).reshape(…,3,3): under heavily
    batched forward-mode AD the reshape forces an XLA layout-change copy
    whose destination has the (3,3) dims minormost — padded 57x onto
    (8,128)/T(4,128) TPU tiles (the round-4 single-chip OOM root cause;
    see the round-5 note in BENCH_NOTES.md).  Pure stacks/concatenates let
    XLA keep batch-minor layouts (measured 1.1x)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        axis=-1)
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        axis=-1)
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis + angle -> quaternion. axis (…,3), angle (…,)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """MuJoCo mju_quatIntegrate semantics: rotate q by angular velocity omega
    (expressed in the same frame that q maps FROM, i.e. local frame) for dt.

    q_next = q ⊗ exp(0.5 * omega * dt).  Used for ball/free-joint qpos
    integration and quaternion-aware FD perturbation
    (/root/reference/src/mjderivative.cpp:163-171,186-194).

    Implemented as a *smooth* quaternion exponential (regularized theta, no
    normalize-the-axis branch) so forward-mode autodiff through it is finite
    at omega = 0 — required by the AD linearizer's tangent-space perturbation
    of quaternion states (ops/linearize.py).

    The regularizer is dtype-aware: SECOND derivatives (cost Hessians in the
    tassa backward pass) carry 1/theta^3 chain terms, so theta_min^3 must
    stay inside the dtype's range — with the f64 value (theta_min=1e-15) the
    f32 term 1/1e-45 overflows to inf and every humanoid backward pass went
    NaN on TPU.  theta_min=1e-6 in f32 biases s away from 0.5 by O(1e-12),
    below f32 resolution.
    """
    v = omega * dt
    eps = 1e-30 if v.dtype == jnp.float64 else 1e-12
    theta = jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)
    half = 0.5 * theta
    s = jnp.sin(half) / theta          # -> 0.5 smoothly as theta -> 0
    dq = jnp.concatenate(
        [jnp.cos(half)[..., None], s[..., None] * v], axis=-1)
    return quat_normalize(quat_mul(q, dq))


def quat_sub(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo mju_subQuat: 3D velocity v such that qb ⊗ exp(v/2) = qa.

    Tangent-space difference used for quaternion state differencing in the
    solver (humanoid nq != nv support)."""
    dq = quat_mul(quat_conj(qb), qa)
    # log map: dq = (cos(a/2), sin(a/2) * axis).  Regularized norm: d|x| at
    # x=0 is NaN and would poison any derivative through a zero rotation
    # (same dtype-aware bound as quat_integrate).
    eps = 1e-30 if dq.dtype == jnp.float64 else 1e-12
    sin_half = jnp.sqrt(jnp.sum(dq[..., 1:] ** 2, axis=-1) + eps)
    cos_half = dq[..., 0]
    angle = 2.0 * jnp.arctan2(sin_half, cos_half)
    # map angle to [-pi, pi] branch (arctan2 of nonneg sin gives [0, 2pi)?
    # arctan2(sin_half>=0, cos) in [0, pi]; wrap to shortest arc:
    angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    axis = dq[..., 1:] / jnp.where(sin_half > 1e-14, sin_half, 1.0)[..., None]
    return axis * angle[..., None]


# --------------------------------------------------------------------------
# 3-vector helpers
# --------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix [v]x, (…,3) -> (…,3,3).

    Row-stack assembly (no reshape) for the same TPU-layout reason as
    quat_to_mat: the stack(…,9)->reshape(…,3,3) form materialized a 57x
    tile-padded copy under the batched AD linearizer."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    r0 = jnp.stack([zero, -z, y], axis=-1)
    r1 = jnp.stack([z, zero, -x], axis=-1)
    r2 = jnp.stack([-y, x, zero], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def mat3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) @ (…,3,3) as explicit component arithmetic.

    TPU rationale: XLA lowers tiny batched dot_generals by copying both
    operands into layouts with the contracted dims minormost; with leading
    batch dims in the 10^5 range those copies pad 57x onto TPU tiles and
    were the round-4 OOM wall.  Component mul/add keeps the whole product
    elementwise-fusible with batch-minor layouts (MXU is irrelevant at 3x3:
    the matmul is 45 FLOP against a 4000x-below-ridge workload,
    tools/roofline.py)."""
    rows = []
    for i in range(3):
        rows.append(jnp.stack(
            [sum(a[..., i, k] * b[..., k, j] for k in range(3))
             for j in range(3)], axis=-1))
    return jnp.stack(rows, axis=-2)


def mat3_vec(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) @ (…,3) in component form (see mat3_mul for why)."""
    return jnp.stack(
        [sum(a[..., i, k] * v[..., k] for k in range(3)) for i in range(3)],
        axis=-1)


# --------------------------------------------------------------------------
# spatial (Plücker) algebra, angular-first, world-origin frame
# --------------------------------------------------------------------------

def cross_motion(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v ×m m (both (…,6))."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1
    )


def cross_force(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v ×f f (dual of cross_motion)."""
    w, vo = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vo, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia(mass, inertia_diag, com, rot) -> jnp.ndarray:
    """6x6 spatial inertia in world Plücker coordinates at the origin.

    mass (…,), inertia_diag (…,3) principal body inertia, com (…,3) world
    position of the center of mass, rot (…,3,3) world-from-inertial rotation.

    With motion V=(omega, v_o) and momentum h = I V = (L_o, p):
      I = [[ I_c + m*Sc*Sc^T ,  m*Sc ],
           [ m*Sc^T          ,  m*1  ]]
    where Sc = skew(com) and I_c = R diag(inertia) R^T.

    Fully component-form (no dot_general, no reshape, no skew temps):
    under the batched AD linearizer the matrix-algebra form materialized
    four ~4G layout-copy temps padded 56.9x onto TPU tiles — 21.7G of the
    22.6G round-4 OOM at B=16384 (XLA allocation dump, BENCH_NOTES.md
    round 5).  Using Sc Sc^T = |c|^2 I - c c^T and assembling the 6x6 with
    row stacks keeps every intermediate elementwise-fusible; XLA then picks
    batch-minor layouts (measured 1.1x padding) for the assembled output.
    """
    d = tuple(inertia_diag[..., k] for k in range(3))
    r = [[rot[..., a, b] for b in range(3)] for a in range(3)]
    cx, cy, cz = com[..., 0], com[..., 1], com[..., 2]
    m = mass
    c = (cx, cy, cz)
    c2 = cx * cx + cy * cy + cz * cz

    def ic(a, b):
        return sum(d[k] * r[a][k] * r[b][k] for k in range(3))

    def tl(a, b):
        t = ic(a, b) - m * c[a] * c[b]
        return t + m * c2 if a == b else t

    z = jnp.zeros_like(m * cx)
    tr = [[z, -m * cz, m * cy],
          [m * cz, z, -m * cx],
          [-m * cy, m * cx, z]]
    rows = []
    for a in range(3):
        rows.append(jnp.stack(
            [tl(a, 0), tl(a, 1), tl(a, 2),
             tr[a][0], tr[a][1], tr[a][2]], axis=-1))
    mm = jnp.broadcast_to(m, z.shape) if m.shape != z.shape else m
    for a in range(3):
        br = [z, z, z]
        br[a] = mm
        rows.append(jnp.stack(
            [tr[0][a], tr[1][a], tr[2][a],
             br[0], br[1], br[2]], axis=-1))
    return jnp.stack(rows, axis=-2)
