"""Multi-host / multi-process execution scaffolding.

The reference is single-process (SURVEY §2.4); its only parallel seam is
`extend` (constraint_system.rs:138-148). The TPU-native scale-out story
has two layers:

  * ICI (within a slice): `jax.sharding.Mesh` + `shard_map`, with `psum` /
    `pmin` collectives — implemented in backend/sharding.py and testable
    on a virtual CPU mesh.
  * DCN (across hosts): `jax.distributed.initialize` turns N processes
    into one logical device set; the SAME mesh/shard_map code then spans
    hosts, with XLA routing slice-internal collectives over ICI and
    cross-slice collectives over DCN. No NCCL/MPI-style backend is
    written by hand — the collectives are compiler-inserted.

This module provides the process-level glue: initialization from env vars
(a `jax.distributed`-style launcher contract), construction of
global-span meshes, and assembly of globally-sharded inputs from
process-local shards. The non-fallback branch is executed for real by
tests/test_multihost_2proc.py: two local processes (4 virtual CPU devices
each) join via jax.distributed.initialize over localhost, run the sharded
witness+verdict step with gloo-backed cross-process collectives, and
assert z-shards bit-equal the single-process run. Real DCN bandwidth
numbers still require pod hardware.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join this process into a multi-host JAX runtime.

    Arguments default to the standard launcher env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). Returns True when
    a multi-process runtime was initialized, False for the single-process
    fallback (no env config — e.g. this dev image)."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "-1") or -1)
    if not coordinator_address or num_processes <= 1 or process_id < 0:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis: str = "data", devices=None) -> Mesh:
    """1-D mesh over ALL devices (local + remote after
    initialize_multihost). Device order is jax.devices() order, which
    groups by process — contiguous shards stay host-local, so the batch
    axis communicates only for the final verdict psum (DCN-light)."""
    devs = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devs), (axis,))


def make_global_batch(
    local_batch: np.ndarray, mesh: Mesh, axis: str = "data"
) -> jax.Array:
    """Assemble a globally-sharded array from per-process local shards
    (each process passes ITS slice of the instance batch; the global
    array spans all processes without materializing anywhere)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def multihost_verdict_step(prog, template, global_batch: int, mesh: Mesh,
                           axis: str = "data"):
    """The production step over a (possibly multi-host) mesh: free inputs
    → sharded witness generation → sharded satisfiability → global
    verdict. Identical code single-host and multi-host; only the mesh
    differs. Returns (step_fn, input_sharding)."""
    from ..backend.sharding import sharded_witness_and_check

    return sharded_witness_and_check(prog, template, global_batch, mesh,
                                     axis=axis)
