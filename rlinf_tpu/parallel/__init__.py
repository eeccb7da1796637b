"""Mesh topology, component placement, and sharding rules.

This package is the TPU-native replacement for the reference's Ray scheduler
fabric (reference: rlinf/scheduler/ — Cluster, WorkerGroup, placement
strategies, CollectiveGroup). Components map to submeshes of a single (or a
few) JAX device meshes; communication is XLA collectives over ICI/DCN instead
of NCCL point-to-point between Ray actors.
"""

from rlinf_tpu.parallel.mesh import (
    AxisNames,
    MeshConfig,
    ComponentPlacement,
    PlacementMode,
    make_mesh,
)
from rlinf_tpu.parallel.sharding import (
    PartitionRules,
    match_partition_rules,
    shard_pytree,
    logical_to_mesh_axes,
)

__all__ = [
    "AxisNames",
    "MeshConfig",
    "ComponentPlacement",
    "PlacementMode",
    "make_mesh",
    "PartitionRules",
    "match_partition_rules",
    "shard_pytree",
    "logical_to_mesh_axes",
]
