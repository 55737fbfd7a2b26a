// ASAN/UBSAN harness for the native MJCF compiler: compiles each XML given
// on argv repeatedly, reads EVERY output array at exactly the shapes the
// ctypes side assumes (ilqg_mujoco_tpu/physics/mjcf_native.py::load_model),
// and frees.  A buffer-size mismatch between what the compiler mallocs and
// what Python reads — the round-3 verdict's candidate explanation for the
// XLA:CPU-suite heap corruption — is exactly an out-of-bounds read here and
// trips AddressSanitizer.  Build: `make asan`; run: `./asan_check <xml...>`.
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <string>

#include "ilqg_model.h"

namespace {

double sum_d(const double* p, long n) {
  double s = 0;
  for (long i = 0; i < n; ++i) s += p[i];
  return s;
}
long sum_i(const int32_t* p, long n) {
  long s = 0;
  for (long i = 0; i < n; ++i) s += p[i];
  return s;
}
long sum_u8(const uint8_t* p, long n) {
  long s = 0;
  for (long i = 0; i < n; ++i) s += p[i];
  return s;
}

double read_all(const IlqgModel& m) {
  const long nb = m.nbody, nj = m.njnt, ng = m.ngeom, nv = m.nv, nq = m.nq,
             nu = m.nu, np = m.npair;
  double s = 0;
  s += sum_i(m.body_parentid, nb);
  s += sum_d(m.body_pos, nb * 3) + sum_d(m.body_quat, nb * 4);
  s += sum_d(m.body_ipos, nb * 3) + sum_d(m.body_iquat, nb * 4);
  s += sum_d(m.body_mass, nb) + sum_d(m.body_inertia, nb * 3);
  s += sum_i(m.jnt_type, nj) + sum_i(m.jnt_bodyid, nj);
  s += sum_i(m.jnt_qposadr, nj) + sum_i(m.jnt_dofadr, nj);
  s += sum_d(m.jnt_pos, nj * 3) + sum_d(m.jnt_axis, nj * 3);
  s += sum_u8(m.jnt_limited, nj) + sum_d(m.jnt_range, nj * 2);
  s += sum_d(m.jnt_stiffness, nj) + sum_d(m.jnt_margin, nj);
  s += sum_d(m.jnt_solref, nj * 2) + sum_d(m.jnt_solimp, nj * 5);
  s += sum_d(m.qpos_spring, nq) + sum_d(m.qpos0, nq);
  s += sum_i(m.dof_bodyid, nv) + sum_i(m.dof_jntid, nv);
  s += sum_d(m.dof_armature, nv) + sum_d(m.dof_damping, nv);
  s += sum_d(m.dof_frictionloss, nv);
  s += sum_i(m.geom_type, ng) + sum_i(m.geom_bodyid, ng);
  s += sum_d(m.geom_pos, ng * 3) + sum_d(m.geom_quat, ng * 4);
  s += sum_d(m.geom_size, ng * 3) + sum_d(m.geom_friction, ng * 3);
  s += sum_i(m.geom_contype, ng) + sum_i(m.geom_conaffinity, ng);
  s += sum_i(m.geom_condim, ng);
  s += sum_d(m.geom_margin, ng) + sum_d(m.geom_gap, ng);
  s += sum_d(m.geom_solref, ng * 2) + sum_d(m.geom_solimp, ng * 5);
  s += sum_d(m.geom_solmix, ng) + sum_i(m.geom_priority, ng);
  s += sum_i(m.actuator_trnid, nu) + sum_d(m.actuator_gear, nu);
  s += sum_u8(m.actuator_ctrllimited, nu);
  s += sum_d(m.actuator_ctrlrange, nu * 2);
  s += sum_i(m.pair_geom1, np) + sum_i(m.pair_geom2, np);
  s += sum_d(m.dof_invweight0, nv) + sum_d(m.body_invweight0, nb * 2);
  return s;
}

}  // namespace

int main(int argc, char** argv) {
  const int reps = 50;
  for (int a = 1; a < argc; ++a) {
    std::ifstream f(argv[a]);
    if (!f) {
      fprintf(stderr, "cannot open %s\n", argv[a]);
      return 2;
    }
    std::stringstream ss;
    ss << f.rdbuf();
    const std::string xml = ss.str();
    for (int r = 0; r < reps; ++r) {
      IlqgModel m;
      if (ilqg_compile_mjcf(xml.c_str(), &m) != 0) {
        fprintf(stderr, "compile failed for %s: %s\n", argv[a], m.error);
        return 1;
      }
      volatile double s = read_all(m);
      (void)s;
      ilqg_free_model(&m);
    }
    printf("OK %s (%d reps)\n", argv[a], reps);
  }
  // error path: must write a NUL-terminated message and allocate nothing
  // that leaks
  IlqgModel m;
  if (ilqg_compile_mjcf("<mujoco><broken", &m) == 0) {
    fprintf(stderr, "expected parse failure\n");
    return 1;
  }
  printf("OK error-path (%s)\n", m.error);
  return 0;
}
