"""Mesh construction, component placement, and partition rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rlinf_tpu.parallel import (
    AxisNames,
    ComponentPlacement,
    MeshConfig,
    PlacementMode,
    make_mesh,
    match_partition_rules,
    shard_pytree,
)


def test_mesh_config_resolve():
    cfg = MeshConfig(data=-1, tensor=2).resolve(8)
    assert cfg.data == 4 and cfg.tensor == 2
    with pytest.raises(ValueError):
        MeshConfig(data=3, tensor=2).resolve(8)
    with pytest.raises(ValueError):
        MeshConfig(data=-1, tensor=-1).resolve(8)


def test_make_mesh_axes(devices):
    mesh = make_mesh(MeshConfig(data=-1, tensor=2))
    assert mesh.shape[AxisNames.DATA] == 4
    assert mesh.shape[AxisNames.TENSOR] == 2
    assert set(mesh.axis_names) == set(AxisNames.ALL)


def test_component_placement_modes(devices):
    collocated = ComponentPlacement(components={"actor": "0-7", "rollout": "0-7"})
    assert collocated.mode == PlacementMode.COLLOCATED

    disagg = ComponentPlacement(components={"actor": "0-3", "rollout": "4-7"})
    assert disagg.mode == PlacementMode.DISAGGREGATED
    assert disagg.device_indices("rollout") == [4, 5, 6, 7]

    hybrid = ComponentPlacement(components={"actor": "0-7", "rollout": "4-7"})
    assert hybrid.mode == PlacementMode.HYBRID
    share_all, share_any = hybrid.pairwise_overlap("actor", "rollout")
    assert not share_all and share_any


def test_component_submesh(devices):
    placement = ComponentPlacement(
        components={"actor": "0-3", "rollout": "4-7"},
        mesh_configs={"actor": MeshConfig(data=-1, tensor=2)},
    )
    actor_mesh = placement.mesh("actor")
    assert actor_mesh.devices.size == 4
    assert actor_mesh.shape[AxisNames.TENSOR] == 2
    rollout_mesh = placement.mesh("rollout")
    assert rollout_mesh.devices.size == 4


def test_placement_bad_indices(devices):
    with pytest.raises(ValueError):
        ComponentPlacement(components={"actor": "0-15"})


def test_match_partition_rules_and_shard(devices):
    params = {
        "layer_0": {"wq": jnp.zeros((16, 32)), "wo": jnp.zeros((32, 16))},
        "embed": {"table": jnp.zeros((64, 16))},
        "scalar": jnp.zeros(()),
    }
    rules = [
        (r"wq", P(None, AxisNames.TENSOR)),
        (r"wo", P(AxisNames.TENSOR, None)),
        (r"embed/table", P(AxisNames.TENSOR, None)),
    ]
    specs = match_partition_rules(rules, params)
    assert specs["layer_0"]["wq"] == P(None, AxisNames.TENSOR)
    assert specs["scalar"] == P()

    mesh = make_mesh(MeshConfig(data=-1, tensor=2))
    sharded = shard_pytree(params, specs, mesh)
    shard_shapes = [
        s.data.shape for s in sharded["layer_0"]["wq"].addressable_shards
    ]
    assert all(s == (16, 16) for s in shard_shapes)


def test_unmatched_param_raises():
    with pytest.raises(ValueError, match="No partition rule"):
        match_partition_rules([], {"w": jnp.zeros((4, 4))})


def test_indivisible_dim_falls_back_to_replicated(devices):
    # hidden=9 not divisible by tensor=2 -> silently replicated (validated).
    mesh = make_mesh(MeshConfig(data=-1, tensor=2))
    params = {"w": jnp.zeros((9, 9))}
    specs = match_partition_rules([(r"w", P(None, AxisNames.TENSOR))], params)
    sharded = shard_pytree(params, specs, mesh)
    assert sharded["w"].addressable_shards[0].data.shape == (9, 9)
