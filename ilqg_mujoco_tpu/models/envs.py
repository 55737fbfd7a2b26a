"""Task/environment layer: (model asset, step cost, solver dims) records —
the analog of the reference's env classes
(/root/reference/inc/inverted_pendulum/*).

The cost contract is the reference's ``stepCostFn_t``
(/root/reference/inc/mjderivative.h:5): one scalar function of the dynamic
state, here ``cost(qpos, qvel, ctrl)`` — pure jnp, differentiable, vmappable.

The reference ships an env class only for the inverted pendulum; hopper and
humanoid are asset-only (SURVEY.md §7.0.11).  We define costs for all three
(hopper/humanoid costs are this framework's extensions, marked as such).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Callable

import jax.numpy as jnp

from ..ilqr import ILQRConfig
from ..ops.linearize import LinearizeConfig
from ..physics import mjcf
from ..physics.model import Model

ASSETS = pathlib.Path(__file__).resolve().parent / "assets"


@dataclasses.dataclass(frozen=True)
class Env:
    name: str
    model: Model
    cost_fn: Callable
    ilqr: ILQRConfig
    warm_steps: int = 0   # env warm-in steps before the first solve


_CACHE = {}


def pendulum(mode: str = "compat", engine: str = "fd") -> Env:
    """Cart-pole swing-up/balance: the reference's only complete env.

    Cost (inc/inverted_pendulum/cost.h:7-17):
        1*qpos0^2 + 10*qpos1^2 + 1*qvel0^2 + 10*qvel1^2 + 1*ctrl0^2
    dims nv=2, nu=1, N=20, 10 iterations per MPC step
    (inc/inverted_pendulum/inverted_pendulum.h:20-24); the env warms in with
    10 free steps before the first solve
    (src/inverted_pendulum/inverted_pendulum.cpp:12-13)."""
    model = _load("cartpole.xml")

    def cost(qpos, qvel, ctrl):
        return (1.0 * qpos[0] ** 2 + 10.0 * qpos[1] ** 2
                + 1.0 * qvel[0] ** 2 + 10.0 * qvel[1] ** 2
                + 1.0 * ctrl[0] ** 2)

    return Env(
        name="pendulum", model=model, cost_fn=cost,
        ilqr=ILQRConfig(horizon=20, iterations=10, mode=mode,
                        lin=LinearizeConfig(engine=engine)),
        warm_steps=10)


def hopper(mode: str = "tassa", engine: str = "ad") -> Env:
    """Planar hopper: asset from the reference (res/hopper.xml), cost is this
    framework's extension (the reference ships no hopper env): track a
    forward velocity while staying tall and upright, small ctrl penalty."""
    model = _load("hopper.xml")

    def cost(qpos, qvel, ctrl):
        v_target = 1.0
        return (2.0 * (qvel[0] - v_target) ** 2      # forward speed
                + 10.0 * (qpos[1] - 1.25) ** 2       # height
                + 1.0 * qpos[2] ** 2                 # torso pitch
                + 0.1 * jnp.sum(qvel[3:] ** 2)
                + 1e-3 * jnp.sum(ctrl ** 2))

    return Env(
        name="hopper", model=model, cost_fn=cost,
        ilqr=ILQRConfig(horizon=40, iterations=10, mode=mode,
                        lin=LinearizeConfig(engine=engine)),
        warm_steps=0)


def humanoid(mode: str = "tassa", engine: str = "ad") -> Env:
    """Humanoid balance: asset from the reference (res/humanoid.xml, shipped
    asset-only — its nq != nv free joint breaks the reference's state map,
    SURVEY.md §1), cost is this framework's extension: stay tall, upright,
    centered, with velocity and ctrl penalties."""
    model = _load("humanoid.xml")

    qpos0_joints = jnp.asarray(model.qpos0[7:])

    def cost(qpos, qvel, ctrl):
        up = 1.0 - 2.0 * (qpos[4] ** 2 + qpos[5] ** 2)  # z-axis alignment
        return (50.0 * (qpos[2] - 1.4) ** 2
                + 20.0 * (1.0 - up) ** 2
                + 1.0 * (qpos[0] ** 2 + qpos[1] ** 2)
                # posture hold: without it the receding 0.15 s horizon lets
                # the knees yield ~0.5 mm/frame — a slow-motion collapse the
                # height term alone doesn't arrest until too late (measured,
                # round-5 balance runs); pulling joints toward qpos0
                # opposes the sag directly
                + 2.0 * jnp.sum((qpos[7:] - qpos0_joints) ** 2)
                + 0.05 * jnp.sum(qvel ** 2)
                + 1e-3 * jnp.sum(ctrl ** 2))

    return Env(
        name="humanoid", model=model, cost_fn=cost,
        # value_scaling on by default: through the humanoid's stiff
        # (solref=.02) contacts ||Vxx|| overflows f32 around 16 knots,
        # which capped TPU horizons at N<=12 in round 2 (BENCH_NOTES.md);
        # the scaled recursion is exact in the representable range and
        # bounded beyond it (tests/test_value_scaling.py)
        # reg_init=1e-2: at N=30 the ill-conditioned value function makes
        # the mu=1e-6 default reject every linesearch candidate (0% descent
        # measured on TPU); mu0 in [1e-2, 1e4] all descend for >=95% of a
        # B=64 batch, 1e-2 keeps short-horizon steps least damped
        ilqr=ILQRConfig(horizon=30, iterations=5, mode=mode,
                        value_scaling=True, reg_init=1e-2,
                        lin=LinearizeConfig(engine=engine)),
        warm_steps=0)


def tumbler(mode: str = "tassa", engine: str = "ad") -> Env:
    """Floating-body attitude control (this framework's minimal nq != nv
    env): a free-joint capsule with a 2-dof internal arm, no gravity, no
    contacts.  Exercises the quaternion state topology (tangent-space
    state_diff -> backward pass -> linesearch) end-to-end at a size that
    compiles on XLA:CPU in seconds — the same composition the humanoid
    covers behind `-m slow` (and that the reference's contiguous [qpos;qvel]
    state map cannot express at all, SURVEY.md §1)."""
    model = _load("tumbler.xml")

    def cost(qpos, qvel, ctrl):
        # attitude + arm braking.  Weights keep the CONTROLLABLE terms
        # dominant: with zero external torque the base attitude responds
        # only slowly (zero-momentum cat-twist), while arm angles/rates
        # respond directly to the motors — a heavily attitude-weighted cost
        # would be mostly unreachable over a 0.2 s horizon.
        return (2.0 * jnp.sum(qpos[4:7] ** 2)       # qx,qy,qz -> 0
                + 2.0 * jnp.sum(qpos[7:] ** 2)      # arm angles
                + 0.2 * jnp.sum(qvel[3:] ** 2)      # angular + joint rates
                + 1e-2 * jnp.sum(ctrl ** 2))

    return Env(
        name="tumbler", model=model, cost_fn=cost,
        ilqr=ILQRConfig(horizon=20, iterations=8, mode=mode,
                        lin=LinearizeConfig(engine=engine)),
        warm_steps=0)


REGISTRY = {"pendulum": pendulum, "hopper": hopper, "humanoid": humanoid,
            "tumbler": tumbler}


def _load(asset: str) -> Model:
    if asset not in _CACHE:
        _CACHE[asset] = mjcf.load_model(str(ASSETS / asset))
    return _CACHE[asset]


def make(name: str, **kw) -> Env:
    return REGISTRY[name](**kw)
