"""Golden reference: the C reference's exact iLQG algorithm, re-implemented
in numpy on the MuJoCo C core (python bindings).

This is the trace oracle for compat-mode parity tests: the reference binary
itself cannot run here (MuJoCo 2.0 + GLFW + license key), so we transcribe
its algorithm faithfully — every quirk included — and drive it with the same
C physics it used:

* FD protocol of src/mjderivative.cpp: pinned iterations=30/tolerance=0,
  nwarmup=3 center evals, center-warmstart restore before every perturbed
  eval, central differences for dqacc, one-sided (+eps) for cost gradients,
  eps=1e-6;
* the Eigen column-major-map quirk: A's lower blocks use the TRANSPOSED
  qpos/qvel Jacobians (SURVEY.md §7.0.1; exact for the nu=1 pendulum);
* the recursion of inc/ilqr.h:133-176 verbatim: fixed mu=1000 added to V and
  never removed, rank-1 Hessians, knot-gap c, and the v-update reading the
  already-assigned new V (C++ aliasing);
* K/k ZERO-initialized (the reference leaves them uninitialized; zero-init
  is the documented determinization, SURVEY.md §7.0.2).

Time is forward-indexed here (t=0 initial .. t=N terminal); the reference's
dArray is reverse-indexed — pure relabeling.
"""

from __future__ import annotations

import numpy as np

import mujoco


class _Snap:
    """The cpMjData state subset (/root/reference/src/util.cpp:4-14)."""

    __slots__ = ("time", "qpos", "qvel", "qacc", "qacc_warmstart",
                 "qfrc_applied", "xfrc_applied", "ctrl")

    @staticmethod
    def of(d):
        s = _Snap()
        for f in _Snap.__slots__:
            v = getattr(d, f)
            setattr(s, f, v.copy() if hasattr(v, "copy") else v)
        return s

    def into(self, d):
        d.time = self.time
        d.qpos[:] = self.qpos
        d.qvel[:] = self.qvel
        d.qacc[:] = self.qacc
        d.qacc_warmstart[:] = self.qacc_warmstart
        d.qfrc_applied[:] = self.qfrc_applied
        d.xfrc_applied[:] = self.xfrc_applied
        d.ctrl[:] = self.ctrl


class RefILQR:
    """ILQR<nv, nu, N> (/root/reference/inc/ilqr.h:14-188), numpy+mujoco."""

    def __init__(self, m, d_init, cost_fn, N, eps=1e-6, niter=30, nwarmup=3,
                 mu=1000.0, scramble_B=False):
        self.m, self.N, self.cost = m, N, cost_fn
        self.eps, self.niter, self.nwarmup, self.mu = eps, niter, nwarmup, mu
        # reproduce the reference's 1<nu<nv ctrl-Jacobian layout bug: the FD
        # buffer is written row-major, deriv[i + j*nu] = dqacc_j/dctrl_i
        # (src/mjderivative.cpp:107), and read back through a COLUMN-major
        # Map<Matrix<nv,nu>> (inc/differentiator.h:22,59).  No-op for nu=1.
        self.scramble_B = scramble_B
        nv, nu = m.nv, m.nu
        self.K = np.zeros((N + 1, nu, 2 * nv))
        self.k = np.zeros((N + 1, nu))
        self.d = mujoco.MjData(m)
        self.dwork = mujoco.MjData(m)
        # initial trajectory: store current then step (inc/ilqr.h:82-87)
        _Snap.of(d_init).into(self.d)
        self.traj = []
        for _ in range(N + 1):
            self.traj.append(_Snap.of(self.d))
            mujoco.mj_step(m, self.d)

    # -- FD linearization (src/mjderivative.cpp worker, single-threaded) ---
    def linearize(self, snap):
        m, d = self.m, self.dwork
        nv, nu, eps = m.nv, m.nu, self.eps
        save_it, save_tol = m.opt.iterations, m.opt.tolerance
        m.opt.iterations, m.opt.tolerance = self.niter, 0.0

        snap.into(d)
        mujoco.mj_forward(m, d)
        for _ in range(self.nwarmup - 1):
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_VEL, 1)
        warm = d.qacc_warmstart.copy()
        qacc0 = d.qacc.copy()
        cost0 = self.cost(snap.qpos, snap.qvel, snap.ctrl)

        def restore():
            snap.into(d)
            d.qacc_warmstart[:] = warm

        Jq = np.zeros((nv, nv))     # true dqacc/dqpos (rows=qacc, cols=dof)
        Jv = np.zeros((nv, nv))
        Ju = np.zeros((nv, nu))
        gq = np.zeros(nv)
        gv = np.zeros(nv)
        gu = np.zeros(nu)
        for i in range(nu):
            restore(); d.ctrl[i] += eps
            gu[i] = (self.cost(d.qpos, d.qvel, d.ctrl) - cost0) / eps
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_VEL, 1)
            plus = d.qacc.copy()
            restore(); d.ctrl[i] -= eps
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_VEL, 1)
            Ju[:, i] = (plus - d.qacc) / (2 * eps)
        for i in range(nv):
            restore(); d.qvel[i] += eps
            gv[i] = (self.cost(d.qpos, d.qvel, d.ctrl) - cost0) / eps
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_POS, 1)
            plus = d.qacc.copy()
            restore(); d.qvel[i] -= eps
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_POS, 1)
            Jv[:, i] = (plus - d.qacc) / (2 * eps)
        for i in range(nv):   # nq==nv assumed (pendulum/hopper)
            restore(); d.qpos[i] += eps
            gq[i] = (self.cost(d.qpos, d.qvel, d.ctrl) - cost0) / eps
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_NONE, 1)
            plus = d.qacc.copy()
            restore(); d.qpos[i] -= eps
            mujoco.mj_forwardSkip(m, d, mujoco.mjtStage.mjSTAGE_NONE, 1)
            Jq[:, i] = (plus - d.qacc) / (2 * eps)

        m.opt.iterations, m.opt.tolerance = save_it, save_tol
        h = m.opt.timestep
        eye = np.eye(nv)
        # Eigen-map quirk: lower blocks are the TRANSPOSED Jacobians
        A = np.block([[eye, h * eye],
                      [h * Jq.T, eye + h * Jv.T]])
        if self.scramble_B:
            # row-major flat buffer re-read column-major (see __init__)
            Ju = Ju.reshape(-1).reshape(nu, nv).T
        B = np.vstack([np.zeros((nv, nu)), h * Ju])
        return A, B, np.concatenate([gq, gv]), gu

    # -- passes (inc/ilqr.h) ----------------------------------------------
    def forward_pass(self, x0_snap):
        m = self.m
        x0_snap.into(self.d)
        new_traj = []
        for t in range(self.N + 1):
            ref = self.traj[t]
            dx = np.concatenate([self.d.qpos - ref.qpos,
                                 self.d.qvel - ref.qvel])
            self.d.ctrl[:] = self.K[t] @ dx + self.k[t] + ref.ctrl
            new_traj.append(_Snap.of(self.d))
            mujoco.mj_step(m, self.d)
        self.traj = new_traj

    def backward_pass(self):
        N, mu = self.N, self.mu
        A, B, q, r = self.linearize(self.traj[N])
        v = q.copy()
        V = np.outer(v, v)
        for t in range(N - 1, -1, -1):
            V = 0.5 * (V + V.T)
            A, B, q, r = self.linearize(self.traj[t])
            Q = np.outer(q, q)
            R = np.outer(r, r)
            c = np.concatenate(
                [self.traj[t + 1].qpos - self.traj[t].qpos,
                 self.traj[t + 1].qvel - self.traj[t].qvel])
            V = V + mu * np.eye(V.shape[0])
            T = -2 * B.T @ V @ B - 2 * R
            self.K[t] = np.linalg.solve(T, 2 * B.T @ V @ A)
            self.k[t] = np.linalg.solve(T, B.T @ (v + 2 * V @ c) + r)
            ABK = A + B @ self.K[t]
            V = ABK.T @ V @ ABK + Q + self.K[t].T @ R @ self.K[t]
            v = (2 * (B @ self.k[t] + c) @ V @ ABK + v @ ABK + q
                 + 2 * self.k[t] @ R @ self.K[t])

    def iterate(self, x0_snap):
        self.forward_pass(x0_snap)
        self.backward_pass()

    def traj_cost(self):
        return sum(self.cost(s.qpos, s.qvel, s.ctrl) for s in self.traj)

    def solve(self, x0_snap, iterations):
        trace = []
        for _ in range(iterations):
            self.iterate(x0_snap)
            trace.append(self.traj_cost())
        return np.array(trace)


def run_mpc_golden(m, d, cost_fn, N, iterations, frames, **ilqr_kw):
    """Receding-horizon MPC loop on the C core, reference semantics
    (InvertedPendulum::forward, src/inverted_pendulum/inverted_pendulum.cpp:
    19-30): per frame re-solve from the current state (the long-lived ILQR
    object keeps its trajectory/gains as warm start), apply the first
    optimized control, advance the plant one mj_step.  Works on any model
    (the reference's env class exists only for the pendulum; the loop itself
    is model-independent).  Returns (qpos, ctrl) per frame, pre-step."""
    ilqr = RefILQR(m, d, cost_fn, N, **ilqr_kw)
    mpc_qpos, mpc_ctrl = [], []
    for _ in range(frames):
        ilqr.solve(_Snap.of(d), iterations)
        d.ctrl[:] = ilqr.traj[0].ctrl
        mpc_qpos.append(d.qpos.copy())
        mpc_ctrl.append(d.ctrl.copy())
        mujoco.mj_step(m, d)
    return np.array(mpc_qpos), np.array(mpc_ctrl)


def pendulum_cost(qpos, qvel, ctrl):
    """inc/inverted_pendulum/cost.h:7-17."""
    return (1.0 * qpos[0] ** 2 + 10.0 * qpos[1] ** 2
            + 1.0 * qvel[0] ** 2 + 10.0 * qvel[1] ** 2
            + 1.0 * ctrl[0] ** 2)


def run_pendulum_golden(xml_path, iterations=10, N=20, warm_steps=10,
                        mpc_frames=0):
    """The reference demo protocol (src/inverted_pendulum/*): warm 10 steps,
    then solve (and optionally run MPC frames).  Returns dict of goldens."""
    m = mujoco.MjModel.from_xml_path(str(xml_path))
    d = mujoco.MjData(m)
    for _ in range(warm_steps):
        mujoco.mj_step(m, d)
    x0 = _Snap.of(d)
    ilqr = RefILQR(m, d, pendulum_cost, N)
    trace = ilqr.solve(x0, iterations)
    out = {
        "trace": trace,
        "x0_qpos": x0.qpos.copy(), "x0_qvel": x0.qvel.copy(),
        "ctrl": np.array([s.ctrl.copy() for s in ilqr.traj]),
        "qpos": np.array([s.qpos.copy() for s in ilqr.traj]),
        "K": ilqr.K.copy(), "k": ilqr.k.copy(),
    }
    if mpc_frames:
        # InvertedPendulum::forward (src/inverted_pendulum/...cpp:19-30)
        mpc_qpos, mpc_ctrl = [], []
        for _ in range(mpc_frames):
            ilqr.solve(_Snap.of(d), iterations)
            d.ctrl[:] = ilqr.traj[0].ctrl
            mpc_qpos.append(d.qpos.copy())
            mpc_ctrl.append(d.ctrl.copy())
            mujoco.mj_step(m, d)
        out["mpc_qpos"] = np.array(mpc_qpos)
        out["mpc_ctrl"] = np.array(mpc_ctrl)
    return out
