// C ABI model struct shared by the compiler (mjcf_compiler.cc), the ctypes
// bindings (ilqg_mujoco_tpu/physics/mjcf_native.py::_IlqgModel — keep the
// field order/types in EXACT sync), and the ASAN harness (asan_check.cc).
#pragma once
#include <cstdint>

extern "C" {

struct IlqgModel {
  // sizes
  int32_t nq, nv, nu, nbody, njnt, ngeom, npair;
  // options
  double timestep, gravity[3], tolerance, impratio;
  int32_t integrator, iterations, cone;
  int32_t override_active;
  double o_solref[2], o_solimp[5], o_margin;
  // arrays (malloc'd, freed by ilqg_free_model)
  int32_t* body_parentid;
  double *body_pos, *body_quat, *body_ipos, *body_iquat, *body_mass,
      *body_inertia;
  int32_t *jnt_type, *jnt_bodyid, *jnt_qposadr, *jnt_dofadr;
  double *jnt_pos, *jnt_axis, *jnt_range;
  uint8_t* jnt_limited;
  double *jnt_stiffness, *jnt_margin, *jnt_solref, *jnt_solimp;
  double *qpos_spring, *qpos0;
  int32_t *dof_bodyid, *dof_jntid;
  double *dof_armature, *dof_damping, *dof_frictionloss;
  int32_t *geom_type, *geom_bodyid;
  double *geom_pos, *geom_quat, *geom_size, *geom_friction;
  int32_t *geom_contype, *geom_conaffinity, *geom_condim;
  double *geom_margin, *geom_gap, *geom_solref, *geom_solimp, *geom_solmix;
  int32_t* geom_priority;
  int32_t* actuator_trnid;
  double* actuator_gear;
  uint8_t* actuator_ctrllimited;
  double* actuator_ctrlrange;
  int32_t *pair_geom1, *pair_geom2;
  double *dof_invweight0, *body_invweight0;
  char error[256];
};

int ilqg_compile_mjcf(const char* xml_text, IlqgModel* out);
void ilqg_free_model(IlqgModel* m);

}  // extern "C"
