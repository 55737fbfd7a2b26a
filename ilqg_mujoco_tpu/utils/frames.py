"""Sim-advance helpers: parity with the reference's update layer
(/root/reference/src/update.cpp — `forwardStep`/`forwardFrame`, dead code in
the reference binary but part of its public surface, SURVEY.md §2)."""

from __future__ import annotations

import jax

from ..physics import forward as fwd
from ..physics.model import Model, State

FPS = 60.0   # /root/reference/src/update.cpp:5


def forward_step(model: Model, state: State) -> State:
    """forwardStep = one mj_step (/root/reference/src/update.cpp:8-11)."""
    return fwd.step(model, state)


def forward_frame(model: Model, state: State, fps: float = FPS) -> State:
    """forwardFrame: step until 1/fps sim seconds have elapsed
    (/root/reference/src/update.cpp:14-20).  Steps-per-frame is static
    (timestep is a model constant), so this compiles to a fixed-length scan
    rather than a data-dependent while loop."""
    n = max(1, int(round(1.0 / fps / model.opt.timestep)))

    def body(s, _):
        return fwd.step(model, s), None

    return jax.lax.scan(body, state, None, length=n)[0]
