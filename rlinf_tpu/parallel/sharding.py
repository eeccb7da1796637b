"""Partition rules: regex path -> PartitionSpec, applied over param pytrees.

This replaces the reference's per-backend parallel wiring (Megatron
column/row-parallel linears, FSDP wrap policies — reference
rlinf/hybrid_engines/megatron/megatron_model_manager.py:178 and
rlinf/hybrid_engines/fsdp/strategy/fsdp.py:43) with declarative sharding:
each model family publishes a rule table mapping parameter-path regexes to
:class:`PartitionSpec`; XLA's SPMD partitioner inserts the collectives that
Megatron implements by hand.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# A rule table: ordered (regex, PartitionSpec) pairs; first match wins.
PartitionRules = Sequence[Tuple[str, P]]


def _flatten_with_paths(tree) -> List[Tuple[str, jax.Array]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path
        )
        out.append((name, leaf))
    return out


def match_partition_rules(rules: PartitionRules, params) -> "jax.tree_util.PyTreeDef":
    """Return a pytree of PartitionSpec matching ``params``' structure.

    Scalar / single-element leaves are always replicated. A leaf whose path
    matches no rule raises — silent replication of a large tensor is a perf
    bug, not a default.
    """

    def spec_for(name: str, leaf) -> P:
        if not hasattr(leaf, "shape") or np.prod(leaf.shape or (1,)) == 1:
            return P()
        for pattern, spec in rules:
            if re.search(pattern, name):
                return spec
        raise ValueError(f"No partition rule matched parameter {name!r}")

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path
        )
        specs.append(spec_for(name, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def _valid_spec_for(leaf, spec: P, mesh: Mesh) -> P:
    """Drop sharding on dims not divisible by the mesh axis size.

    Keeps rule tables usable for tiny test models where e.g. hidden=16 can't
    split over tensor=4.
    """
    if not hasattr(leaf, "shape"):
        return P()
    out = []
    for dim, axis in enumerate(tuple(spec) + (None,) * (len(leaf.shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if leaf.shape[dim] % size == 0 and size > 1:
            out.append(axis)
        else:
            out.append(None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def shard_pytree(tree, specs, mesh: Mesh, validate: bool = True):
    """Device-put every leaf with its NamedSharding (host->device layout)."""

    def put(leaf, spec):
        s = _valid_spec_for(leaf, spec, mesh) if validate else spec
        return jax.device_put(leaf, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(put, tree, specs)


def tree_shardings(tree, specs, mesh: Mesh, validate: bool = True):
    """NamedSharding pytree for use as in_shardings/out_shardings of jit."""

    def mk(leaf, spec):
        s = _valid_spec_for(leaf, spec, mesh) if validate else spec
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map(mk, tree, specs)


def logical_to_mesh_axes(
    logical_axes: Sequence[Optional[str]],
    mapping: Dict[str, Union[str, Tuple[str, ...], None]],
) -> P:
    """Translate logical axis names (e.g. 'embed', 'vocab') into mesh axes."""
    return P(*(mapping.get(a) if a is not None else None for a in logical_axes))


def with_sharding_constraint(x, spec: P):
    """``lax.with_sharding_constraint`` that is a no-op outside a mesh context."""
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x
