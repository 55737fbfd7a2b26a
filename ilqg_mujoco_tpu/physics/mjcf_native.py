"""ctypes bindings for the native C++ MJCF compiler (native/mjcf_compiler.cc).

The production loader path: host-side model compilation in C++ (the analog of
the reference's native mj_loadXML), returning the same :class:`Model` the
pure-Python compiler (mjcf.py) produces.  Semantics parity is enforced by
tests/test_native_loader.py; mjcf.py remains the executable specification and
the fallback when the shared library is absent.

Usage:
    from ilqg_mujoco_tpu.physics import mjcf_native
    model = mjcf_native.load_model("model.xml")        # builds lib on demand
"""

from __future__ import annotations

import ctypes as C
import pathlib
import subprocess
from typing import Optional

import numpy as np

from .model import Model, Option

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB: Optional[C.CDLL] = None


class _IlqgModel(C.Structure):
    _fields_ = (
        [("nq", C.c_int32), ("nv", C.c_int32), ("nu", C.c_int32),
         ("nbody", C.c_int32), ("njnt", C.c_int32), ("ngeom", C.c_int32),
         ("npair", C.c_int32),
         ("timestep", C.c_double), ("gravity", C.c_double * 3),
         ("tolerance", C.c_double), ("impratio", C.c_double),
         ("integrator", C.c_int32), ("iterations", C.c_int32),
         ("cone", C.c_int32), ("override_active", C.c_int32),
         ("o_solref", C.c_double * 2), ("o_solimp", C.c_double * 5),
         ("o_margin", C.c_double)]
        + [(n, C.POINTER(C.c_int32)) for n in ["body_parentid"]]
        + [(n, C.POINTER(C.c_double)) for n in
           ["body_pos", "body_quat", "body_ipos", "body_iquat", "body_mass",
            "body_inertia"]]
        + [(n, C.POINTER(C.c_int32)) for n in
           ["jnt_type", "jnt_bodyid", "jnt_qposadr", "jnt_dofadr"]]
        + [(n, C.POINTER(C.c_double)) for n in
           ["jnt_pos", "jnt_axis", "jnt_range"]]
        + [("jnt_limited", C.POINTER(C.c_uint8))]
        + [(n, C.POINTER(C.c_double)) for n in
           ["jnt_stiffness", "jnt_margin", "jnt_solref", "jnt_solimp",
            "qpos_spring", "qpos0"]]
        + [(n, C.POINTER(C.c_int32)) for n in ["dof_bodyid", "dof_jntid"]]
        + [(n, C.POINTER(C.c_double)) for n in
           ["dof_armature", "dof_damping", "dof_frictionloss"]]
        + [(n, C.POINTER(C.c_int32)) for n in ["geom_type", "geom_bodyid"]]
        + [(n, C.POINTER(C.c_double)) for n in
           ["geom_pos", "geom_quat", "geom_size", "geom_friction"]]
        + [(n, C.POINTER(C.c_int32)) for n in
           ["geom_contype", "geom_conaffinity", "geom_condim"]]
        + [(n, C.POINTER(C.c_double)) for n in
           ["geom_margin", "geom_gap", "geom_solref", "geom_solimp",
            "geom_solmix"]]
        + [("geom_priority", C.POINTER(C.c_int32)),
           ("actuator_trnid", C.POINTER(C.c_int32)),
           ("actuator_gear", C.POINTER(C.c_double)),
           ("actuator_ctrllimited", C.POINTER(C.c_uint8)),
           ("actuator_ctrlrange", C.POINTER(C.c_double)),
           ("pair_geom1", C.POINTER(C.c_int32)),
           ("pair_geom2", C.POINTER(C.c_int32)),
           ("dof_invweight0", C.POINTER(C.c_double)),
           ("body_invweight0", C.POINTER(C.c_double)),
           ("error", C.c_char * 256)]
    )


def _ensure_lib() -> C.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "libilqg_mjcf.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = C.CDLL(str(so))
    lib.ilqg_compile_mjcf.argtypes = [C.c_char_p, C.POINTER(_IlqgModel)]
    lib.ilqg_compile_mjcf.restype = C.c_int
    lib.ilqg_free_model.argtypes = [C.POINTER(_IlqgModel)]
    _LIB = lib
    return lib


def _arr(ptr, shape, dtype=np.float64):
    n = int(np.prod(shape)) if shape else 0
    if n == 0:
        return np.zeros(shape, dtype)
    buf = np.ctypeslib.as_array(ptr, shape=(n,))
    return np.array(buf, dtype=dtype).reshape(shape)


def available() -> bool:
    try:
        _ensure_lib()
        return True
    except Exception:
        return False


def load_model(path: Optional[str] = None,
               xml_string: Optional[str] = None) -> Model:
    """Compile MJCF via the native library -> Model (same layout as
    mjcf.load_model)."""
    lib = _ensure_lib()
    if xml_string is None:
        xml_string = pathlib.Path(path).read_text()
    cm = _IlqgModel()
    rc = lib.ilqg_compile_mjcf(xml_string.encode(), C.byref(cm))
    if rc != 0:
        err = cm.error.decode()
        raise ValueError(f"native MJCF compile failed: {err}")
    try:
        nb, nj, ng, nv, nq, nu, npair = (cm.nbody, cm.njnt, cm.ngeom, cm.nv,
                                         cm.nq, cm.nu, cm.npair)
        opt = Option(
            timestep=cm.timestep, gravity=tuple(cm.gravity),
            integrator=cm.integrator, iterations=cm.iterations,
            tolerance=cm.tolerance, cone=cm.cone, impratio=cm.impratio,
            override_active=bool(cm.override_active),
            o_solref=tuple(cm.o_solref), o_solimp=tuple(cm.o_solimp),
            o_margin=cm.o_margin)
        model = Model(
            nq=nq, nv=nv, nu=nu, nbody=nb, njnt=nj, ngeom=ng, opt=opt,
            body_parentid=_arr(cm.body_parentid, (nb,), np.int32),
            body_pos=_arr(cm.body_pos, (nb, 3)),
            body_quat=_arr(cm.body_quat, (nb, 4)),
            body_ipos=_arr(cm.body_ipos, (nb, 3)),
            body_iquat=_arr(cm.body_iquat, (nb, 4)),
            body_mass=_arr(cm.body_mass, (nb,)),
            body_inertia=_arr(cm.body_inertia, (nb, 3)),
            jnt_type=_arr(cm.jnt_type, (nj,), np.int32),
            jnt_bodyid=_arr(cm.jnt_bodyid, (nj,), np.int32),
            jnt_qposadr=_arr(cm.jnt_qposadr, (nj,), np.int32),
            jnt_dofadr=_arr(cm.jnt_dofadr, (nj,), np.int32),
            jnt_pos=_arr(cm.jnt_pos, (nj, 3)),
            jnt_axis=_arr(cm.jnt_axis, (nj, 3)),
            jnt_limited=_arr(cm.jnt_limited, (nj,), np.uint8).astype(bool),
            jnt_range=_arr(cm.jnt_range, (nj, 2)),
            jnt_stiffness=_arr(cm.jnt_stiffness, (nj,)),
            jnt_margin=_arr(cm.jnt_margin, (nj,)),
            jnt_solref=_arr(cm.jnt_solref, (nj, 2)),
            jnt_solimp=_arr(cm.jnt_solimp, (nj, 5)),
            qpos_spring=_arr(cm.qpos_spring, (nq,)),
            qpos0=_arr(cm.qpos0, (nq,)),
            dof_bodyid=_arr(cm.dof_bodyid, (nv,), np.int32),
            dof_jntid=_arr(cm.dof_jntid, (nv,), np.int32),
            dof_armature=_arr(cm.dof_armature, (nv,)),
            dof_damping=_arr(cm.dof_damping, (nv,)),
            dof_frictionloss=_arr(cm.dof_frictionloss, (nv,)),
            geom_type=_arr(cm.geom_type, (ng,), np.int32),
            geom_bodyid=_arr(cm.geom_bodyid, (ng,), np.int32),
            geom_pos=_arr(cm.geom_pos, (ng, 3)),
            geom_quat=_arr(cm.geom_quat, (ng, 4)),
            geom_size=_arr(cm.geom_size, (ng, 3)),
            geom_friction=_arr(cm.geom_friction, (ng, 3)),
            geom_contype=_arr(cm.geom_contype, (ng,), np.int32),
            geom_conaffinity=_arr(cm.geom_conaffinity, (ng,), np.int32),
            geom_condim=_arr(cm.geom_condim, (ng,), np.int32),
            geom_margin=_arr(cm.geom_margin, (ng,)),
            geom_gap=_arr(cm.geom_gap, (ng,)),
            geom_solref=_arr(cm.geom_solref, (ng, 2)),
            geom_solimp=_arr(cm.geom_solimp, (ng, 5)),
            geom_solmix=_arr(cm.geom_solmix, (ng,)),
            geom_priority=_arr(cm.geom_priority, (ng,), np.int32),
            actuator_trnid=_arr(cm.actuator_trnid, (nu,), np.int32),
            actuator_gear=_arr(cm.actuator_gear, (nu,)),
            actuator_ctrllimited=_arr(cm.actuator_ctrllimited, (nu,),
                                      np.uint8).astype(bool),
            actuator_ctrlrange=_arr(cm.actuator_ctrlrange, (nu, 2)),
            pair_geom1=_arr(cm.pair_geom1, (npair,), np.int32),
            pair_geom2=_arr(cm.pair_geom2, (npair,), np.int32),
            dof_invweight0=_arr(cm.dof_invweight0, (nv,)),
            body_invweight0=_arr(cm.body_invweight0, (nb, 2)),
        )
    finally:
        lib.ilqg_free_model(C.byref(cm))
    return model
