"""Test configuration: CPU backend (8 virtual devices for sharding tests),
float64 for golden comparisons against the MuJoCo C core.

The real TPU is reserved for bench.py; tests mirror the multi-host strategy
recommended in SURVEY.md §4 (CPU mesh via xla_force_host_platform_device_count).
"""
import os

# --xla_backend_optimization_level=1: this image's jax 0.9.0 XLA:CPU
# miscompiles large fused iLQR graphs at the default optimization level
# (out-of-bounds kernel writes -> heap corruption, found by bisection while
# building the solver; TPU is unaffected).  Level 1 is verified clean.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=1"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do NOT enable the persistent compilation cache here.  In this image
# the cache can serve XLA:CPU AOT executables compiled with mismatched
# machine-feature flags (the loader warns "prefer-no-scatter not supported on
# the host machine") which produced silently different numerics in sharded
# tests.  Golden-parity tests must always compile fresh.

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def assets_dir():
    import pathlib
    return pathlib.Path(__file__).resolve().parent.parent / \
        "ilqg_mujoco_tpu" / "models" / "assets"


@pytest.fixture(scope="session")
def reference_dir():
    import pathlib
    p = pathlib.Path("/root/reference/res")
    if not p.exists():
        pytest.skip("reference assets not available")
    return p
