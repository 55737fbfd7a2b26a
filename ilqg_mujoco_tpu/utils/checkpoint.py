"""Checkpoint / resume for solver and environment state.

The reference has no checkpointing (SURVEY.md §5): its implicit state is the
N+1 mjData snapshots held in RAM (inc/ilqr.h:52).  Here the entire solver
state is a pytree — (trajectory State, K, k, mu) — so persistence is a
structure-preserving array dump.  Two backends:

* npz (default, zero-dependency, single host);
* orbax (sharded/async, multi-host) when available.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ilqr import ILQRState
from ..physics.model import State


def save(path, env_state: State, solver_state: ILQRState,
         extra: dict = None) -> None:
    """Dump (env State, ILQRState) to a .npz."""
    payload = {}
    for f in dataclasses.fields(State):
        payload[f"env/{f.name}"] = np.asarray(getattr(env_state, f.name))
        payload[f"sol/traj/{f.name}"] = np.asarray(
            getattr(solver_state.traj, f.name))
    payload["sol/K"] = np.asarray(solver_state.K)
    payload["sol/k"] = np.asarray(solver_state.k)
    payload["sol/mu"] = np.asarray(solver_state.mu)
    for k, v in (extra or {}).items():
        payload[f"extra/{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load(path) -> Tuple[State, ILQRState, dict]:
    """Restore (env State, ILQRState, extras) from a .npz."""
    z = np.load(path)

    def grab(prefix, names):
        return {n: jnp.asarray(z[f"{prefix}/{n}"]) for n in names}

    env_fields = [f.name for f in dataclasses.fields(State)]
    env_state = State(**grab("env", env_fields))
    traj = State(**{n: jnp.asarray(z[f"sol/traj/{n}"]) for n in env_fields})
    sol = ILQRState(traj=traj, K=jnp.asarray(z["sol/K"]),
                    k=jnp.asarray(z["sol/k"]), mu=jnp.asarray(z["sol/mu"]))
    extra = {k[len("extra/"):]: z[k] for k in z.files
             if k.startswith("extra/")}
    return env_state, sol, extra


def save_orbax(path, tree: Any) -> None:
    """Orbax backend for sharded multi-host checkpoints (optional dep)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(pathlib.Path(path).absolute(), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path, like: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(pathlib.Path(path).absolute(), like)
