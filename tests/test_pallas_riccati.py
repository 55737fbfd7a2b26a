"""Pallas fused backward-pass kernel == the XLA scan compat backward pass.

Runs the kernel in interpret mode (tests are CPU-only; the device path is
exercised by tools/pallas_bench.py on the TPU and recorded in
BENCH_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqg_mujoco_tpu import ilqr
from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.ops.linearize import linearize_traj
from ilqg_mujoco_tpu.experimental.pallas_riccati import backward_compat_batched
from ilqg_mujoco_tpu.physics.model import make_state


def test_pallas_backward_matches_scan():
    env = envs.pendulum()          # compat mode, nu=1
    m, cfg = env.model, env.ilqr
    N = cfg.horizon

    qposes = [[0.05, 0.2], [-0.1, 0.4], [0.2, -0.3]]
    As, Bs, gxs, gus, diffs_l, Ks, ks = [], [], [], [], [], [], []
    for qp in qposes:
        s0 = make_state(m).replace(qpos=jnp.asarray(qp))
        sol = ilqr.init_solver(m, s0, cfg)
        traj = ilqr.forward_pass(m, s0, sol, cfg)
        lin = linearize_traj(m, traj, env.cost_fn, cfg.lin)
        K, k = ilqr.backward_pass_compat(m, traj, lin, cfg)
        d = jnp.concatenate([traj.qpos[1:] - traj.qpos[:-1],
                             traj.qvel[1:] - traj.qvel[:-1]], axis=1)
        As.append(lin.A[:N]); Bs.append(lin.B[:N])
        gxs.append(lin.gx); gus.append(lin.gu[:N])
        diffs_l.append(d); Ks.append(K[:N]); ks.append(k[:N])

    stack = lambda xs: jnp.stack(xs)
    Kp, kp = backward_compat_batched(
        stack(As), stack(Bs), stack(gxs), stack(gus), stack(diffs_l),
        cfg.mu, interpret=True)

    np.testing.assert_allclose(np.asarray(Kp), np.asarray(stack(Ks)),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(stack(ks)),
                               rtol=1e-9, atol=1e-11)


def test_pallas_backward_pads_ragged_batch():
    """Batch sizes that don't divide the 1024-lane tile are padded and
    un-padded transparently."""
    env = envs.pendulum()
    m, cfg = env.model, env.ilqr
    N = cfg.horizon
    s0 = make_state(m).replace(qpos=jnp.asarray([0.03, 0.15]))
    sol = ilqr.init_solver(m, s0, cfg)
    traj = ilqr.forward_pass(m, s0, sol, cfg)
    lin = linearize_traj(m, traj, env.cost_fn, cfg.lin)
    K, k = ilqr.backward_pass_compat(m, traj, lin, cfg)
    d = jnp.concatenate([traj.qpos[1:] - traj.qpos[:-1],
                         traj.qvel[1:] - traj.qvel[:-1]], axis=1)

    Bt = 5
    rep = lambda x: jnp.broadcast_to(x, (Bt,) + x.shape)
    Kp, kp = backward_compat_batched(
        rep(lin.A[:N]), rep(lin.B[:N]), rep(lin.gx), rep(lin.gu[:N]),
        rep(d), cfg.mu, interpret=True)
    assert Kp.shape == (Bt, N, 1, 2 * m.nv)
    for b in range(Bt):
        np.testing.assert_allclose(np.asarray(Kp[b]), np.asarray(K[:N]),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(kp[b]), np.asarray(k[:N]),
                                   rtol=1e-9, atol=1e-11)
