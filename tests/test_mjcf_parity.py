"""MJCF compiler golden tests: my Model arrays vs MuJoCo's compiled mjModel.

Covers the compiler semantics the reference relies on via mj_loadXML
(/root/reference/cmd/basic.cpp:123): defaults, angle=degree, inertiafromgeom,
fromto capsules, joint refs, ctrllimited auto, and the legacy
coordinate="global" mode (hopper)."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from ilqg_mujoco_tpu.physics import mjcf


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def assert_model_matches_mujoco(m, mm, tol=1e-10):
    assert (m.nq, m.nv, m.nu, m.nbody, m.njnt, m.ngeom) == \
        (mm.nq, mm.nv, mm.nu, mm.nbody, mm.njnt, mm.ngeom)
    np.testing.assert_allclose(m.body_mass, mm.body_mass, atol=tol)
    np.testing.assert_allclose(m.body_pos, mm.body_pos, atol=tol)
    np.testing.assert_allclose(m.body_ipos, mm.body_ipos, atol=tol)
    # compare inertia tensors (frame decomposition is sign/order ambiguous)
    for b in range(m.nbody):
        R1 = _quat_to_mat(m.body_iquat[b])
        R2 = _quat_to_mat(mm.body_iquat[b])
        I1 = R1 @ np.diag(m.body_inertia[b]) @ R1.T
        I2 = R2 @ np.diag(mm.body_inertia[b]) @ R2.T
        np.testing.assert_allclose(I1, I2, atol=1e-9)
    np.testing.assert_array_equal(m.jnt_type, mm.jnt_type)
    np.testing.assert_allclose(m.jnt_range, mm.jnt_range, atol=tol)
    np.testing.assert_allclose(m.jnt_axis, mm.jnt_axis, atol=tol)
    np.testing.assert_allclose(m.jnt_pos, mm.jnt_pos, atol=tol)
    np.testing.assert_allclose(m.qpos0, mm.qpos0, atol=tol)
    np.testing.assert_allclose(m.dof_armature, mm.dof_armature, atol=tol)
    np.testing.assert_allclose(m.dof_damping, mm.dof_damping, atol=tol)
    np.testing.assert_allclose(m.jnt_stiffness, mm.jnt_stiffness, atol=tol)
    np.testing.assert_allclose(m.geom_size, mm.geom_size, atol=tol)
    np.testing.assert_allclose(m.geom_pos, mm.geom_pos, atol=tol)
    np.testing.assert_allclose(m.geom_friction, mm.geom_friction, atol=tol)
    np.testing.assert_allclose(m.geom_solref, mm.geom_solref, atol=tol)
    np.testing.assert_allclose(m.geom_solimp, mm.geom_solimp, atol=tol)
    np.testing.assert_allclose(m.geom_margin, mm.geom_margin, atol=tol)
    np.testing.assert_allclose(m.actuator_gear, mm.actuator_gear[:, 0],
                               atol=tol)
    np.testing.assert_allclose(m.actuator_ctrlrange, mm.actuator_ctrlrange,
                               atol=tol)
    # compile-time constraint weights (mj_setConst)
    np.testing.assert_allclose(m.dof_invweight0, mm.dof_invweight0,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(m.body_invweight0, mm.body_invweight0,
                               rtol=1e-9, atol=1e-12)


def test_pendulum_compile(reference_dir):
    xml = str(reference_dir / "inverted_pendulum.xml")
    assert_model_matches_mujoco(mjcf.load_model(xml),
                                mujoco.MjModel.from_xml_path(xml))


def test_cartpole_asset_equals_reference(assets_dir, reference_dir):
    """Our re-authored cartpole compiles to the same physics."""
    m1 = mjcf.load_model(str(assets_dir / "cartpole.xml"))
    m2 = mjcf.load_model(str(reference_dir / "inverted_pendulum.xml"))
    np.testing.assert_allclose(m1.body_mass, m2.body_mass, atol=1e-12)
    np.testing.assert_allclose(m1.body_inertia, m2.body_inertia, atol=1e-12)
    np.testing.assert_allclose(m1.jnt_range, m2.jnt_range, atol=1e-12)
    np.testing.assert_allclose(m1.actuator_gear, m2.actuator_gear)
    assert m1.opt.integrator == m2.opt.integrator
    assert m1.opt.timestep == m2.opt.timestep


def test_humanoid_compile(assets_dir):
    xml = str(assets_dir / "humanoid.xml")
    m = mjcf.load_model(xml)
    mm = mujoco.MjModel.from_xml_path(xml)
    assert (m.nq, m.nv, m.nu) == (28, 27, 21)
    assert_model_matches_mujoco(m, mm)


def test_hopper_global_coordinates(assets_dir, reference_dir):
    """The legacy global-coordinate reference hopper compiles to the same
    model as our local re-authoring (and that matches MuJoCo)."""
    mg = mjcf.load_model(str(reference_dir / "hopper.xml"))
    ml = mjcf.load_model(str(assets_dir / "hopper.xml"))
    np.testing.assert_allclose(mg.body_pos, ml.body_pos, atol=1e-12)
    np.testing.assert_allclose(mg.body_mass, ml.body_mass, atol=1e-12)
    np.testing.assert_allclose(mg.body_ipos, ml.body_ipos, atol=1e-12)
    np.testing.assert_allclose(mg.body_inertia, ml.body_inertia, atol=1e-12)
    np.testing.assert_allclose(mg.jnt_pos, ml.jnt_pos, atol=1e-12)
    np.testing.assert_allclose(mg.jnt_axis, ml.jnt_axis, atol=1e-12)
    np.testing.assert_allclose(mg.jnt_range, ml.jnt_range, atol=1e-12)
    np.testing.assert_allclose(mg.qpos0, ml.qpos0, atol=1e-12)
    np.testing.assert_allclose(mg.geom_pos, ml.geom_pos, atol=1e-12)
    np.testing.assert_allclose(
        np.abs(mg.geom_quat), np.abs(ml.geom_quat), atol=1e-12)
    # and the local file matches MuJoCo 3.x
    mm = mujoco.MjModel.from_xml_path(str(assets_dir / "hopper.xml"))
    assert_model_matches_mujoco(ml, mm)


def test_hopper_sizes(assets_dir):
    m = mjcf.load_model(str(assets_dir / "hopper.xml"))
    assert (m.nq, m.nv, m.nu) == (6, 6, 3)
    assert m.opt.integrator == 0 and m.opt.timestep == 0.002
    # o_solref parsed but override flag not set -> inert (reference quirk)
    assert m.opt.o_solref == (0.1, 1.0)
    assert not m.opt.override_active
