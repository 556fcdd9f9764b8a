"""Multi-host (multi-process) execution: jax.distributed + DCN-spanning
meshes.

SURVEY.md §2.6 names the full distributed story as
``jax.distributed.initialize`` + ICI within a slice *and DCN across
hosts*; BASELINE.md targets >=70% scaling efficiency at "N>=2 hosts".
The reference itself is single-process (no counterpart anchor — this is
a north-star requirement, not parity). This module is the
process-spanning half:

* ``init_distributed`` — one-call cluster bring-up (coordinator
  address / process count / process id from args or XIVO_* env vars),
  wrapping ``jax.distributed.initialize`` so every process sees the
  GLOBAL device set.
* ``global_mesh`` — a 1-D mesh over all global devices (the
  data-parallel axis of the batch VIO runner and the landmark axis of
  the distributed BA).
* ``host_local_to_global`` / ``global_to_host_local`` — the host-local
  data layout bridge: each process feeds only its own sequences
  (host-local leading batch shard); the runner consumes one global
  jax.Array sharded over the full mesh.
* ``make_multihost_runner`` — the batch VIO runner on a
  process-spanning mesh, taking host-local inputs and returning
  host-local outputs. The per-device program is byte-identical to the
  single-process sharded runner (runner.make_sharded_runner): the
  filter itself needs no collectives, so DCN carries only dispatch
  metadata — the structural basis of the scaling claim (SCALING.md).

Verified by tests/test_multihost.py: a REAL two-process CPU cluster
(coordinator on localhost, 4 virtual devices per process) must produce
bit-identical trajectories and distributed-BA results to the
single-process 8-device mesh.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Bring up (or no-op without config) the jax.distributed cluster.

    Args fall back to XIVO_COORDINATOR / XIVO_NUM_PROCESSES /
    XIVO_PROCESS_ID env vars; returns True when a multi-process cluster
    was initialized, False for the single-process fallback (so callers
    can unconditionally call this first).
    """
    coordinator_address = coordinator_address \
        or os.environ.get("XIVO_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("XIVO_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("XIVO_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or not num_processes or num_processes < 2:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def global_mesh(axis: str = "data") -> jax.sharding.Mesh:
    """1-D mesh over ALL global devices (all processes)."""
    return jax.sharding.Mesh(np.asarray(jax.devices()), (axis,))


def host_local_to_global(tree, mesh: jax.sharding.Mesh,
                         axis: str = "data"):
    """Per-process leading-batch shards -> one global sharded jax.Array.

    Each process passes its OWN (B_local, ...) leaves; the result is a
    (B_global, ...) array laid out over the process-spanning mesh with
    no data movement (each shard stays on its host's devices).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    specs = jax.tree.map(lambda _: P(axis), tree)
    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, specs)


def global_to_host_local(tree, mesh: jax.sharding.Mesh,
                         axis: str = "data"):
    """Inverse bridge: global sharded arrays -> this process's shards."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    specs = jax.tree.map(lambda _: P(axis), tree)
    return multihost_utils.global_array_to_host_local_array(
        tree, mesh, specs)


def make_multihost_runner(cfg, mesh: jax.sharding.Mesh,
                          axis: str = "data"):
    """Batch VIO runner over a process-spanning mesh.

    Takes HOST-LOCAL (B_local, ...) states/inputs, returns host-local
    outputs. B_local * num_processes must be divisible by the mesh
    size. The compute is runner.make_sharded_runner verbatim — the
    same per-device scan program, now dispatched from every process
    onto a global mesh (DCN crosses only at dispatch + the output
    fetch, never inside the filter).
    """
    from ..runner import make_sharded_runner
    run = make_sharded_runner(cfg, mesh, axis)

    def run_multihost(states_local, fis_local):
        states_g = host_local_to_global(states_local, mesh, axis)
        fis_g = host_local_to_global(fis_local, mesh, axis)
        s_g, outs_g = run(states_g, fis_g)
        return (global_to_host_local(s_g, mesh, axis),
                global_to_host_local(outs_g, mesh, axis))

    return run_multihost
