"""Native C++ MJCF compiler (native/mjcf_compiler.cc) vs the Python
compiler: array-for-array parity on every reference asset."""

import numpy as np
import pytest

from ilqg_mujoco_tpu.physics import mjcf, mjcf_native

if not mjcf_native.available():
    pytest.skip("native library unavailable (g++ missing?)",
                allow_module_level=True)

_FIELDS = [
    "body_parentid", "body_pos", "body_quat", "body_ipos", "body_mass",
    "body_inertia", "jnt_type", "jnt_bodyid", "jnt_qposadr", "jnt_dofadr",
    "jnt_pos", "jnt_axis", "jnt_limited", "jnt_range", "jnt_stiffness",
    "jnt_margin", "jnt_solref", "jnt_solimp", "qpos_spring", "qpos0",
    "dof_bodyid", "dof_jntid", "dof_armature", "dof_damping",
    "dof_frictionloss", "geom_type", "geom_bodyid", "geom_pos", "geom_size",
    "geom_friction", "geom_contype", "geom_conaffinity", "geom_condim",
    "geom_margin", "geom_gap", "geom_solref", "geom_solimp", "geom_solmix",
    "geom_priority", "actuator_trnid", "actuator_gear",
    "actuator_ctrllimited", "actuator_ctrlrange", "pair_geom1", "pair_geom2",
    "dof_invweight0", "body_invweight0",
]


@pytest.mark.parametrize("asset", ["cartpole.xml", "hopper.xml",
                                   "humanoid.xml"])
def test_native_matches_python(assets_dir, asset):
    mp = mjcf.load_model(str(assets_dir / asset))
    mn = mjcf_native.load_model(str(assets_dir / asset))
    assert (mn.nq, mn.nv, mn.nu, mn.nbody, mn.njnt, mn.ngeom) == \
        (mp.nq, mp.nv, mp.nu, mp.nbody, mp.njnt, mp.ngeom)
    assert mn.opt.timestep == mp.opt.timestep
    assert mn.opt.integrator == mp.opt.integrator
    assert mn.opt.iterations == mp.opt.iterations
    assert mn.opt.override_active == mp.opt.override_active
    np.testing.assert_allclose(mn.opt.o_solref, mp.opt.o_solref)
    for f in _FIELDS:
        a, b = getattr(mn, f), getattr(mp, f)
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            atol=1e-12, rtol=1e-10, err_msg=f)
    # quats may differ by sign/frame convention in degenerate cases; compare
    # the rotations they induce on the inertia instead
    for b in range(mp.nbody):
        def rot(q):
            w, x, y, z = q
            return np.array([
                [1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
                [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
                [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])
        I1 = rot(mn.body_iquat[b]) @ np.diag(mn.body_inertia[b]) @ \
            rot(mn.body_iquat[b]).T
        I2 = rot(mp.body_iquat[b]) @ np.diag(mp.body_inertia[b]) @ \
            rot(mp.body_iquat[b]).T
        np.testing.assert_allclose(I1, I2, atol=1e-10)


def test_native_legacy_global_coords(reference_dir):
    """The native compiler also handles the legacy global-coordinate
    hopper."""
    mn = mjcf_native.load_model(str(reference_dir / "hopper.xml"))
    mp = mjcf.load_model(str(reference_dir / "hopper.xml"))
    np.testing.assert_allclose(mn.body_pos, mp.body_pos, atol=1e-12)
    np.testing.assert_allclose(mn.jnt_pos, mp.jnt_pos, atol=1e-12)
    np.testing.assert_allclose(mn.geom_pos, mp.geom_pos, atol=1e-12)
    np.testing.assert_allclose(mn.qpos0, mp.qpos0, atol=1e-12)


def test_native_error_reporting():
    with pytest.raises(ValueError, match="native MJCF compile failed"):
        mjcf_native.load_model(xml_string="<mujoco><broken")
