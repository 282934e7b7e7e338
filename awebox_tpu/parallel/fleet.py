"""Multi-chip / multi-host sweep fleets.

SURVEY section 5.8 / section 7 step 10: the distributed backend of this
framework is the JAX runtime itself. A fleet of independent scenario NLPs is
pure data parallelism — the batched interior-point solve (parallel/batch.py)
vmaps over the scenario axis, and this module shards that axis over an
arbitrary `jax.sharding.Mesh`:

* single host, N chips: `fleet_mesh()` builds a 1-axis mesh over the local
  devices; scenarios ride ICI with zero collectives (independent problems).
* multiple hosts: `init_distributed()` wraps `jax.distributed.initialize`
  (one process per host, DCN for control plane); `fleet_mesh()` then spans
  the GLOBAL device set and `run_fleet` feeds each process its local
  scenario shard through `jax.make_array_from_process_local_data`. No NCCL/
  MPI analog is written by hand — the XLA runtime owns transport, exactly as
  jit owns kernels (the reference's only parallelism is single-process
  OpenMP maps, sweep.py:117-172 + SURVEY section 2.10).

`measure_scaling` produces the BASELINE.md scaling curve (solves/s at 1
device vs the full mesh) on whatever devices are visible — real chips on a
TPU host, virtual CPU devices in CI.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host entry: call once per host process before any jax use.
    No-op when single-process (the common case)."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def fleet_mesh(devices=None, axis_name: str = 'scenario'):
    """1-axis scenario mesh over the (global) device set."""
    import jax
    from jax.sharding import Mesh
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_fleet_state(state, P_batch, mesh, axis_name: str = 'scenario'):
    """Distribute batched state/parameters over the mesh. Under multi-host,
    each process contributes its local shard of the leading scenario axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return (jax.tree_util.tree_map(put, state),
            jax.tree_util.tree_map(put, P_batch))


def run_fleet(ocp, lb, ub, state, P_batch, mesh=None, n_iter: int = 200,
              tol: float = 0.0, axis_name: str = 'scenario'):
    """One fleet solve: shard, run the batched IP solve, gather results.

    Returns (out_state, wall_seconds). The scenario batch size must divide
    the mesh size."""
    import jax
    from ..parallel.batch import make_batched_solver
    if mesh is None:
        mesh = fleet_mesh()
    state_sh, P_sh = shard_fleet_state(state, P_batch, mesh, axis_name)
    solve = make_batched_solver(ocp, lb, ub, n_iter=n_iter, mesh=mesh,
                                batch_p=True, tol=tol, axis_name=axis_name)
    out = solve(state_sh, P_sh)
    jax.block_until_ready(out)
    t0 = time.time()
    out = solve(state_sh, P_sh)
    jax.block_until_ready(out)
    return out, time.time() - t0


def measure_scaling(ocp, lb, ub, state, P_batch, n_iter: int = 50,
                    tol: float = 0.0):
    """solves/s at 1 device vs all devices (BASELINE.md scaling anchor).

    Uses the same batch on a single-device mesh and on the full mesh;
    reports {'devices', 'wall_1', 'wall_n', 'speedup'}."""
    import jax
    devs = jax.devices()
    _, wall_1 = run_fleet(ocp, lb, ub, state, P_batch,
                          mesh=fleet_mesh(devs[:1]), n_iter=n_iter, tol=tol)
    _, wall_n = run_fleet(ocp, lb, ub, state, P_batch,
                          mesh=fleet_mesh(devs), n_iter=n_iter, tol=tol)
    return {'devices': len(devs), 'wall_1': wall_1, 'wall_n': wall_n,
            'speedup': wall_1 / max(wall_n, 1e-9)}
