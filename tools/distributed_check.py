"""Multi-process jax.distributed exercise: the SURVEY §2a distributed row,
actually run.

The reference is single-process shared-memory (OpenMP) only; our scaling
story is `jax.distributed` + XLA collectives.  Real multi-host TPU hardware
is not available in CI, so this script runs the full multi-process path on
the CPU backend: N processes x 4 virtual devices each, one global `data`
mesh, the sharded batched compat solve, and a cross-process allgather of the
cost traces.  A single-process run of the same code is the golden.

Usage (spawned by tests/test_distributed.py):
    python tools/distributed_check.py OUT.npz PROC_ID NPROCS COORD_ADDR
"""

import os
import pathlib
import sys

OUT, PROC_ID, NPROCS, COORD = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]), sys.argv[4])

# per-process virtual devices BEFORE importing jax (same pinning rationale as
# tests/conftest.py: opt level 1 dodges an XLA:CPU miscompile in this image)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
    + " --xla_backend_optimization_level=1")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# this image's sitecustomize may import jax (axon plugin registration) before
# this script runs, so the env vars above can be too late for platform
# selection — pin it through the config API as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from ilqg_mujoco_tpu.parallel import distributed  # noqa: E402

# THE call under test (dead code in round 1 — VERDICT round 1, missing #4)
distributed.initialize(coordinator=COORD, num_processes=NPROCS,
                       process_id=PROC_ID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from ilqg_mujoco_tpu import ilqr  # noqa: E402
from ilqg_mujoco_tpu.models import envs  # noqa: E402
from ilqg_mujoco_tpu.parallel import batch as pbatch  # noqa: E402

assert jax.process_count() == NPROCS
n_global = len(jax.devices())
assert n_global == 4 * NPROCS, n_global

env = envs.pendulum()   # compat + fd, the golden-backed config
import dataclasses
env = dataclasses.replace(
    env, ilqr=dataclasses.replace(env.ilqr, horizon=10, iterations=3))

B = 8
mesh = Mesh(np.array(jax.devices()).reshape(n_global), ("data",))
shard = NamedSharding(mesh, P("data"))

# identical global inputs on every process (deterministic numpy noise), then
# global arrays assembled from process-local shards
rng = np.random.RandomState(0)
noise = 0.02 * rng.randn(B, env.model.nq)


def _global(arr):
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, jax.sharding.NamedSharding(
            mesh, P(*(("data",) + (None,) * (arr.ndim - 1)))),
        lambda idx: arr[idx])


sb_host, sols_host = pbatch.init_batched(env, B, qpos_noise=0.0)
sb_host = sb_host.replace(qpos=sb_host.qpos + jnp.asarray(noise))
# re-init solver trajectories from the perturbed states (host-side, replicated)
sols_host = jax.vmap(lambda s: ilqr.init_solver(env.model, s, env.ilqr))(
    sb_host)

tm = jax.tree_util.tree_map
sb = tm(_global, sb_host)
sols = tm(_global, sols_host)

solve = jax.jit(
    jax.vmap(lambda s, so: ilqr.solve(env.model, env.cost_fn, s, so,
                                      env.ilqr)),
    in_shardings=(shard, shard), out_shardings=shard)
sols2, traces = solve(sb, sols)

# exercise a cross-host collective too: global mean of the final costs
mean_cost = distributed.global_mean(traces[:, -1], mesh)

from jax.experimental import multihost_utils  # noqa: E402

traces_all = multihost_utils.process_allgather(traces, tiled=True)
qpos_all = multihost_utils.process_allgather(sols2.traj.qpos, tiled=True)

if PROC_ID == 0:
    np.savez(OUT, traces=np.asarray(traces_all),
             qpos=np.asarray(qpos_all),
             mean_cost=float(mean_cost),
             nprocs=NPROCS, ndevices=n_global)
print(f"proc {PROC_ID}/{NPROCS}: ok ({n_global} global devices)")
