"""Multi-host bootstrap + host-sharded data utilities.

Reference analog: the Ray cluster bootstrap (reference ray_utils/start_ray.sh
RANK-based head/worker join + rlinf/scheduler/cluster/cluster.py env plumbing
MASTER_ADDR/RANK/WORLD_SIZE). On TPU pods this collapses to
``jax.distributed.initialize`` — each host runs the SAME driver script; JAX
discovers the slice topology and global device set.

Also provides ``host_local_to_global``: build a globally-sharded array from
per-host numpy shards (the data-loading pattern for multi-host input
pipelines — each host tokenizes/loads only its rows).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX. No-ops on single-process runs.

    On TPU pods all arguments are discovered from the metadata server; on
    CPU/GPU fleets pass them explicitly or via env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    if jax.default_backend() == "cpu":
        # Cross-process ``jax.device_put`` (the disaggregated weight-sync
        # transfer) rides native ICI/DCN on TPU pods, but the CPU backend
        # needs an explicit transfer server. Enables the same
        # disagg placement drills on virtual-device CI meshes.
        try:
            jax.config.update(
                "jax_cross_host_transfer_socket_address", "127.0.0.1:0")
        except Exception:  # older jax without the flag: drills skip instead
            pass


def process_info() -> Dict[str, int]:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def host_local_to_global(
    local_batch: Dict[str, np.ndarray],
    mesh: Mesh,
    spec: P,
) -> Dict[str, jax.Array]:
    """Per-host numpy shards -> one globally-sharded jax.Array per key.

    Each host passes its own rows (global batch // process_count); the result
    is addressable-shard-assembled without any cross-host transfer
    (``jax.make_array_from_process_local_data``).
    """
    out = {}
    for k, v in local_batch.items():
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def shard_rows_for_process(n_rows: int) -> slice:
    """Row range of the global batch this process should load."""
    pc, pi = jax.process_count(), jax.process_index()
    assert n_rows % pc == 0, f"batch {n_rows} not divisible by {pc} hosts"
    per = n_rows // pc
    return slice(pi * per, (pi + 1) * per)


def global_device_put(x, mesh: Mesh, spec: P) -> jax.Array:
    """``device_put`` that also works across processes.

    Single-process: plain ``jax.device_put``. Multi-process: every host holds
    the same full host-side value (SPMD driver discipline — the runner runs
    identically on every host) and only this host's addressable shards are
    materialized on device via ``make_array_from_callback`` — i.e. each host
    feeds only its rows, the host-sharded input-pipeline pattern of the
    reference's per-rank dataloaders (rlinf/scheduler/cluster env plumbing)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fetch_global(x) -> np.ndarray:
    """Full host value of a (possibly non-fully-addressable) global array.

    Multi-process analog of ``np.asarray``: replicated arrays are read
    locally, sharded ones are allgathered across hosts
    (``multihost_utils.process_allgather`` — the reference's rollout-result
    channel fan-in, rlinf/scheduler/channel/channel.py:38)."""
    if isinstance(x, np.ndarray) or jax.process_count() == 1:
        return np.asarray(x)
    if getattr(x, "is_fully_replicated", False):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
