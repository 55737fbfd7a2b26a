"""Receding-horizon MPC driver: the analog of InvertedPendulum::forward()
(/root/reference/src/inverted_pendulum/inverted_pendulum.cpp:19-30), lifted
into a single jitted lax.scan over frames.

Per frame (one reference render-loop tick, cmd/basic.cpp:158-179):
  1. re-solve the horizon problem from the current env state
     (setDInit + iterations x iterate, inverted_pendulum.cpp:21-23);
  2. apply the first optimized control (:26);
  3. advance the real environment one step (:29).

The solver state (trajectory + gains) persists across frames exactly like
the reference's long-lived ILQR object — that is the warm start that makes
10 iterations per frame enough.

Unlike the reference (which hides this loop inside a v-synced GLFW render
loop), the whole run compiles to one XLA program: no host round-trips, which
is what makes batched/sharded MPC (parallel.py) possible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import ilqr
from .models.envs import Env
from .physics import forward as fwd
from .physics.model import Model, State, make_state


class MPCOut(NamedTuple):
    env_states: State        # (frames, ...) trajectory of the real system
    controls: jnp.ndarray    # (frames, nu) applied controls
    cost_trace: jnp.ndarray  # (frames, iterations) per-iteration solve costs
    step_cost: jnp.ndarray   # (frames,) running cost of the real system
    final_state: State = None          # carry after the last frame …
    final_sol: "ilqr.ILQRState" = None  # … for checkpoint/resume


def mpc_step(env: Env, env_state: State, sol: ilqr.ILQRState):
    """One MPC frame.  Returns (env_state', sol', info)."""
    model, cfg = env.model, env.ilqr
    sol, cost_trace = ilqr.solve(model, env.cost_fn, env_state, sol, cfg)
    u0 = sol.traj.ctrl[0]
    applied = env_state.replace(ctrl=u0)
    env_next = fwd.step(model, applied)
    step_cost = env.cost_fn(env_state.qpos, env_state.qvel, u0)
    return env_next, sol, (u0, cost_trace, step_cost)


def init(env: Env, x0: State = None):
    """Warm in the env (the ctor's free steps) and build the solver state."""
    model = env.model
    s = make_state(model) if x0 is None else x0
    for _ in range(env.warm_steps):
        s = fwd.step(model, s)
    sol = ilqr.init_solver(model, s, env.ilqr)
    return s, sol


def _scan_frames(env: Env, frames: int, s0: State, sol0: ilqr.ILQRState):
    def body(carry, _):
        s, sol = carry
        s2, sol2, (u0, trace, c) = mpc_step(env, s, sol)
        return (s2, sol2), (s, u0, trace, c)

    return jax.lax.scan(body, (s0, sol0), None, length=frames)


def _under_trace(state: State) -> bool:
    """True when called inside any jax transformation trace (jit/vmap/grad).

    The leaf isinstance check alone is insufficient: with x0=None the
    initial state is built from constants, which stay CONCRETE inside a
    jit trace — but the host segment loop would still be inlined."""
    if isinstance(state.qpos, jax.core.Tracer):
        return True
    try:
        from jax._src import core as _src_core
        return not _src_core.trace_state_clean()
    except (ImportError, AttributeError):   # private API moved: best effort
        return False


def run(env: Env, frames: int, x0: State = None,
        segment_frames: int = None, sol0: "ilqr.ILQRState" = None) -> MPCOut:
    """Full MPC rollout.

    ``segment_frames=None`` (default): the whole run is ONE lax.scan — jit
    the returned computation and there are zero host round-trips.  At very
    large scale (hundreds of humanoid frames) a single XLA program can
    exceed what the backend compiles reliably; ``segment_frames=k`` instead
    compiles ONE k-frame program and drives it from a host loop, carrying
    (env state, solver state) across segments — identical numerics (the
    segment boundary is just a host round-trip of the carry), program size
    bounded by k.  Call un-jitted in that case.

    ``sol0``: resume from a saved (env state, solver state) pair
    (utils/checkpoint.py) — skips the warm-in and solver re-init so the run
    continues exactly where the checkpoint left off; requires ``x0``."""
    if sol0 is not None:
        if x0 is None:
            raise ValueError("sol0 (resume) requires the matching x0")
        s0 = x0
    else:
        s0, sol0 = init(env, x0)

    if segment_frames is not None and _under_trace(s0):
        # segment_frames exists to BOUND compiled-program size via a host
        # loop; tracing it (run() called under jax.jit/vmap/grad) would
        # silently inline every segment into one giant XLA program,
        # defeating the purpose — fail loudly instead
        raise ValueError(
            "mpc.run(segment_frames=...) must be called un-jitted: under a "
            "trace the host segment loop inlines into a single XLA program, "
            "which is exactly what segment_frames exists to avoid.  Call "
            "run() outside jit (it jits each segment internally), or drop "
            "segment_frames to get the single-scan jittable form.")

    if segment_frames is None or segment_frames >= frames:
        (sf, solf), (states, us, traces, cs) = _scan_frames(
            env, frames, s0, sol0)
        return MPCOut(env_states=states, controls=us, cost_trace=traces,
                      step_cost=cs, final_state=sf, final_sol=solf)

    seg = segment_frames
    segf = jax.jit(lambda s, sol: _scan_frames(env, seg, s, sol))
    carry, outs = (s0, sol0), []
    for _ in range(-(-frames // seg)):       # ceil; one compiled program
        carry, out = segf(*carry)
        outs.append(out)
    cat = lambda *xs: jax.tree_util.tree_map(
        lambda *a: jnp.concatenate(a)[:frames], *xs)
    states, us, traces, cs = (cat(*[o[i] for o in outs]) for i in range(4))
    # NOTE: with a ragged tail (frames % seg != 0) the carry has advanced
    # ceil(frames/seg)*seg frames — a few past `frames`.  Checkpoint users
    # who need the carry at exactly `frames` should pick seg | frames.
    return MPCOut(env_states=states, controls=us, cost_trace=traces,
                  step_cost=cs, final_state=carry[0], final_sol=carry[1])
