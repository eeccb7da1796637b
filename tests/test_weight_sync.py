"""Weight syncers across disjoint submeshes (disaggregated-mode analog)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from rlinf_tpu.parallel import ComponentPlacement, MeshConfig
from rlinf_tpu.parallel.mesh import AxisNames as Ax
from rlinf_tpu.parallel.weight_sync import (
    BucketWeightSyncer,
    PatchWeightSyncer,
    WeightSyncer,
    make_weight_syncer,
)


@pytest.fixture()
def placement(devices):
    return ComponentPlacement(
        components={"learner": "0-3", "rollout": "4-7"},
        mesh_configs={
            "learner": MeshConfig(data=-1, tensor=2),
            "rollout": MeshConfig(data=-1, tensor=2),
        },
    )


def _params(rng):
    return {
        "w1": jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32)),
        "scale": jnp.asarray(rng.normal(size=(16,)).astype(np.float32)),
    }


RULES = [
    (r"w1", P(None, Ax.TENSOR)),
    (r"w2", P(Ax.TENSOR, None)),
    (r"scale", P()),
]


def _assert_tree_equal(a, b, **kw):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_full_sync_across_meshes(placement):
    rng = np.random.default_rng(0)
    params = _params(rng)
    rollout_mesh = placement.mesh("rollout")
    syncer = WeightSyncer(rollout_mesh, RULES)
    out = syncer.sync(params)
    _assert_tree_equal(out, params)
    # landed on the rollout submesh devices
    devs = {d for d in out["w1"].sharding.device_set}
    expected = set(np.ravel(rollout_mesh.devices))
    assert devs == expected
    assert syncer.version == 1
    # w1 sharded over rollout tensor axis
    assert out["w1"].addressable_shards[0].data.shape == (16, 16)


def test_bucket_sync_equivalent(placement):
    rng = np.random.default_rng(1)
    params = _params(rng)
    syncer = BucketWeightSyncer(
        placement.mesh("rollout"), RULES, bucket_bytes=1024
    )
    out = syncer.sync(params)
    _assert_tree_equal(out, params)


def test_patch_sync_tracks_updates(placement):
    rng = np.random.default_rng(2)
    params = _params(rng)
    syncer = PatchWeightSyncer(placement.mesh("rollout"), RULES, quantize=True)

    out0 = syncer.sync(params)
    _assert_tree_equal(out0, params)  # first sync is exact (full transfer)
    full_bytes = syncer.last_bytes_sent

    # simulate ten optimizer steps with small updates; lossy patch sync must
    # stay close to the source and use ~4x less bandwidth (int8 vs f32)
    for step in range(10):
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jnp.asarray(
                np.random.default_rng(step).normal(size=x.shape), jnp.float32
            ),
            params,
        )
        out = syncer.sync(params)
        assert syncer.last_bytes_sent < full_bytes / 3
    _assert_tree_equal(out, params, rtol=0, atol=5e-4)
    assert syncer.version == 11


def test_patch_sync_error_does_not_accumulate(placement):
    """Quantization error must stay bounded across many syncs."""
    rng = np.random.default_rng(3)
    params = _params(rng)
    syncer = PatchWeightSyncer(placement.mesh("rollout"), RULES, quantize=True)
    syncer.sync(params)
    errs = []
    for step in range(20):
        params = jax.tree_util.tree_map(
            lambda x: x + 0.005 * jnp.sin(jnp.asarray(float(step + 1))) * jnp.ones_like(x),
            params,
        )
        out = syncer.sync(params)
        err = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(params)
            )
        )
        errs.append(err)
    assert errs[-1] < 1e-3
    # error at sync 20 is not dramatically worse than at sync 3
    assert errs[-1] < 10 * max(errs[2], 1e-6)


def test_registry():
    with pytest.raises(KeyError):
        make_weight_syncer("bogus", None, None)


def test_dtype_conversion(placement):
    rng = np.random.default_rng(4)
    params = _params(rng)
    syncer = WeightSyncer(placement.mesh("rollout"), RULES, dtype="bfloat16")
    out = syncer.sync(params)
    assert out["w1"].dtype == jnp.bfloat16


def test_patch_sync_topk_error_feedback(placement):
    """Top-k sparsified patches: unsent delta carries into the next sync
    (error feedback), so the target converges when updates stop."""
    rng = np.random.default_rng(4)
    params = _params(rng)
    syncer = PatchWeightSyncer(
        placement.mesh("rollout"), RULES, compression="topk", topk_ratio=0.25
    )
    syncer.sync(params)
    full_bytes = syncer.last_bytes_sent

    # one real update, then repeated syncs with NO further source change:
    # each top-k round ships more of the outstanding delta
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jnp.asarray(
            np.random.default_rng(9).normal(size=x.shape), jnp.float32
        ),
        params,
    )
    errs = []
    for _ in range(12):
        out = syncer.sync(params)
        assert syncer.last_bytes_sent < full_bytes  # sparse payload
        errs.append(max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            for a, b in zip(
                jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(params)
            )
        ))
    assert errs[-1] < errs[0] / 4  # converging toward the source
    assert errs[-1] < 5e-3


def test_patch_sync_blockwise_beats_per_tensor_outlier(placement):
    """Per-block int8 scales keep fidelity when one coordinate jumps
    (per-tensor scaling would crush every other delta to zero)."""
    w = jnp.zeros((4, 512), jnp.float32)
    params = {"w1": w}
    syncer = PatchWeightSyncer(
        placement.mesh("rollout"), RULES, block_size=128
    )
    syncer.sync(params)
    # tiny uniform drift + one huge outlier in a different block
    new = w + 1e-3
    new = new.at[0, 0].set(100.0)
    out = syncer.sync({"w1": new})
    got = np.asarray(out["w1"])
    assert got[0, 0] == pytest.approx(100.0, rel=1e-2)
    # blocks away from the outlier still resolve the 1e-3 drift
    assert abs(got[3, 400] - 1e-3) < 2e-4
