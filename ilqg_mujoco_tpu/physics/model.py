"""Static model description and dynamic state pytree.

Design
------
The reference keeps a MuJoCo ``mjModel*`` (static) and passes ``mjData*``
snapshots around; its "state" is the subset copied by ``cpMjData``
(/root/reference/src/util.cpp:4-14): time, qpos, qvel, qacc, qacc_warmstart,
qfrc_applied, xfrc_applied, ctrl.  Here:

* :class:`Model` is a frozen host-side dataclass of numpy arrays + Python
  ints.  It is **closed over** by the jitted dynamics functions rather than
  passed as a traced argument, so XLA constant-folds all model parameters —
  the idiomatic choice for a fixed robot model replicated across a TPU mesh.
* :class:`State` is a JAX pytree (registered dataclass) — exactly the
  ``cpMjData`` subset — so a trajectory is just a stacked State and a batch of
  problems is a vmapped State.

Joint/geom type enums match MuJoCo's values so golden tests can compare
against the ``mujoco`` python bindings directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

# MuJoCo enum values (mjtJoint / mjtGeom / mjtIntegrator / mjtCone)
JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE = 0, 1, 2, 3
GEOM_PLANE, GEOM_SPHERE, GEOM_CAPSULE, GEOM_ELLIPSOID, GEOM_CYLINDER, GEOM_BOX = (
    0, 2, 3, 4, 5, 6)
INT_EULER, INT_RK4 = 0, 1
CONE_PYRAMIDAL, CONE_ELLIPTIC = 0, 1

# dofs/qpos widths per joint type
JNT_NV = {JNT_FREE: 6, JNT_BALL: 3, JNT_SLIDE: 1, JNT_HINGE: 1}
JNT_NQ = {JNT_FREE: 7, JNT_BALL: 4, JNT_SLIDE: 1, JNT_HINGE: 1}


@dataclasses.dataclass(frozen=True)
class Option:
    """Simulation options (MJCF <option>), reference defaults.

    ``iterations``/``tolerance`` mirror the solver pinning the FD engine relies
    on (/root/reference/src/mjderivative.cpp:241-242)."""
    timestep: float = 0.002
    gravity: tuple = (0.0, 0.0, -9.81)
    integrator: int = INT_EULER
    iterations: int = 100
    tolerance: float = 1e-8
    ls_iterations: int = 50
    cone: int = CONE_PYRAMIDAL
    impratio: float = 1.0
    # constraint overrides (<option o_solref o_solimp> + <flag override>)
    override_active: bool = False
    o_solref: tuple = (0.02, 1.0)
    o_solimp: tuple = (0.9, 0.95, 0.001, 0.5, 2.0)
    o_margin: float = 0.0
    disable_contact: bool = False
    disable_limit: bool = False
    disable_gravity: bool = False
    disable_clampctrl: bool = False
    disable_eulerdamp: bool = False


@dataclasses.dataclass(frozen=True)
class Model:
    """Compiled model: numpy arrays, host-resident, hashable by identity.

    Field names follow mjModel for easy golden comparison in
    tests/test_mjcf_parity.py."""
    # sizes
    nq: int
    nv: int
    nu: int
    nbody: int
    njnt: int
    ngeom: int

    opt: Option

    # bodies
    body_parentid: np.ndarray   # (nbody,) int
    body_pos: np.ndarray        # (nbody,3)
    body_quat: np.ndarray       # (nbody,4)
    body_ipos: np.ndarray       # (nbody,3)
    body_iquat: np.ndarray      # (nbody,4)
    body_mass: np.ndarray       # (nbody,)
    body_inertia: np.ndarray    # (nbody,3)

    # joints
    jnt_type: np.ndarray        # (njnt,) int
    jnt_bodyid: np.ndarray      # (njnt,) int
    jnt_qposadr: np.ndarray     # (njnt,) int
    jnt_dofadr: np.ndarray      # (njnt,) int
    jnt_pos: np.ndarray         # (njnt,3) local
    jnt_axis: np.ndarray        # (njnt,3) local
    jnt_limited: np.ndarray     # (njnt,) bool
    jnt_range: np.ndarray       # (njnt,2)
    jnt_stiffness: np.ndarray   # (njnt,)
    jnt_margin: np.ndarray      # (njnt,)
    jnt_solref: np.ndarray      # (njnt,2)
    jnt_solimp: np.ndarray      # (njnt,5)
    qpos_spring: np.ndarray     # (nq,)
    qpos0: np.ndarray           # (nq,)

    # dofs
    dof_bodyid: np.ndarray      # (nv,) int
    dof_jntid: np.ndarray       # (nv,) int
    dof_armature: np.ndarray    # (nv,)
    dof_damping: np.ndarray     # (nv,)
    dof_frictionloss: np.ndarray  # (nv,)

    # geoms
    geom_type: np.ndarray       # (ngeom,) int
    geom_bodyid: np.ndarray     # (ngeom,) int
    geom_pos: np.ndarray        # (ngeom,3)
    geom_quat: np.ndarray       # (ngeom,4)
    geom_size: np.ndarray       # (ngeom,3)
    geom_friction: np.ndarray   # (ngeom,3)
    geom_contype: np.ndarray    # (ngeom,) int
    geom_conaffinity: np.ndarray  # (ngeom,) int
    geom_condim: np.ndarray     # (ngeom,) int
    geom_margin: np.ndarray     # (ngeom,)
    geom_gap: np.ndarray        # (ngeom,)
    geom_solref: np.ndarray     # (ngeom,2)
    geom_solimp: np.ndarray     # (ngeom,5)
    geom_solmix: np.ndarray     # (ngeom,)
    geom_priority: np.ndarray   # (ngeom,) int

    # actuators (motor/joint transmission only — the only kind in the
    # reference assets, e.g. /root/reference/res/hopper.xml:31-35)
    actuator_trnid: np.ndarray      # (nu,) joint id
    actuator_gear: np.ndarray       # (nu,)
    actuator_ctrllimited: np.ndarray  # (nu,) bool
    actuator_ctrlrange: np.ndarray  # (nu,2)

    # precomputed candidate contact pairs (static collision lists)
    pair_geom1: np.ndarray      # (npair,) int
    pair_geom2: np.ndarray      # (npair,) int

    # compile-time constraint weights at qpos0 (mj_setConst analogs): MuJoCo
    # builds constraint regularizers R from these, not from the
    # instantaneous J M^-1 J^T
    dof_invweight0: np.ndarray = None   # (nv,)
    body_invweight0: np.ndarray = None  # (nbody,2) [translation, rotation]

    name: str = "model"

    # -- derived conveniences -------------------------------------------
    def __post_init__(self):
        # ancestor mask: anc[b, a] = 1 if body a is ancestor-of-or-equal b
        anc = np.zeros((self.nbody, self.nbody), dtype=np.float64)
        for b in range(self.nbody):
            a = b
            while a != 0:
                anc[b, a] = 1.0
                a = int(self.body_parentid[a])
        # world (body 0) is never counted: it carries no dofs
        object.__setattr__(self, "ancestor_mask", anc)
        # dof mask: dofmask[b, i] = 1 if dof i moves body b
        dm = anc[:, self.dof_bodyid]  # (nbody, nv)
        object.__setattr__(self, "dof_mask", dm)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _register_state():
    """Register State as a pytree dataclass."""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """The dynamic state — the exact cpMjData subset
    (/root/reference/src/util.cpp:4-14)."""
    time: jnp.ndarray            # ()
    qpos: jnp.ndarray            # (nq,)
    qvel: jnp.ndarray            # (nv,)
    qacc: jnp.ndarray            # (nv,)
    qacc_warmstart: jnp.ndarray  # (nv,)
    qfrc_applied: jnp.ndarray    # (nv,)
    xfrc_applied: jnp.ndarray    # (nbody,6) — (force, torque) world, at body com
    ctrl: jnp.ndarray            # (nu,)

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


def make_state(model: Model, dtype=None) -> State:
    """Fresh State at qpos0 (mj_makeData semantics).

    dtype defaults to the platform default float (f64 under jax_enable_x64 —
    the golden-parity mode — else f32, the TPU mode)."""
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    return State(
        time=jnp.zeros((), dtype),
        qpos=jnp.asarray(model.qpos0, dtype),
        qvel=jnp.zeros((model.nv,), dtype),
        qacc=jnp.zeros((model.nv,), dtype),
        qacc_warmstart=jnp.zeros((model.nv,), dtype),
        qfrc_applied=jnp.zeros((model.nv,), dtype),
        xfrc_applied=jnp.zeros((model.nbody, 6), dtype),
        ctrl=jnp.zeros((model.nu,), dtype),
    )
