"""Dynamic scheduler: replan decisions + live submesh migration on the
8-device CPU mesh (the AUTO-mode analog of reference
rlinf/scheduler/dynamic_scheduler/)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from rlinf_tpu.parallel.dynamic_scheduler import (
    DynamicScheduler,
    make_migratable_phase,
    migrate_sharded_state,
    submesh,
)


def test_scheduler_migrates_when_disagg_wins():
    """Collocated pays a 1.5s/step engine switch cost (weight sync + cache
    realloc — what the reference's AUTO mode removes): 3 + 1 + 1.5 = 5.5s.
    A 6/2 split pipelines to max(3*(8/6), 1*(8/2)) = 4.0s — the scheduler
    must migrate, then hold the split (hysteresis) at steady state."""
    sched = DynamicScheduler(8, interval=3, warmup_steps=1, hysteresis=0.1,
                             sync_disaggregated_s=0.0)
    mig = None
    for _ in range(6):
        m = sched.observe({"time/rollout": 3.0, "time/training": 1.0,
                           "time/weight_sync": 1.5})
        mig = m or mig
    assert mig is not None, "scheduler never migrated"
    assert mig.plan.mode == "disaggregated"
    assert mig.plan.rollout_chips > mig.plan.train_chips
    # projected step beats collocated 5.5s
    assert mig.plan.step_seconds < 5.5

    # After migration, timings now reflect the new split; a matching
    # steady-state must NOT trigger another migration (hysteresis).
    r = mig.plan.details["rollout_s"]
    t = mig.plan.details["train_s"]
    n_before = len(sched.migrations)
    for _ in range(6):
        sched.observe({"time/rollout": r, "time/training": t})
    assert len(sched.migrations) == n_before, "scheduler flapped"


def test_scheduler_sublinear_rollout_scaling():
    """Latency-bound decode (alpha≈0.2) barely speeds up with more chips, so
    the solver gives the chips to training instead."""
    sched = DynamicScheduler(8, interval=2, warmup_steps=1, hysteresis=0.05,
                             rollout_alpha=0.2, sync_disaggregated_s=0.0,
                             sync_collocated_s=1.0)
    mig = None
    for _ in range(4):
        m = sched.observe({"time/rollout": 2.0, "time/training": 2.0})
        mig = m or mig
    assert mig is not None
    # rollout loses chips cheaply (alpha 0.2), training keeps most of them
    assert mig.plan.train_chips > mig.plan.rollout_chips


def test_scheduler_stays_collocated_when_balanced():
    """With sync overhead and balanced phases, collocated wins; no migration."""
    sched = DynamicScheduler(8, interval=3, warmup_steps=1, hysteresis=0.1,
                             sync_disaggregated_s=1.0)
    for _ in range(9):
        m = sched.observe({"time/rollout": 1.0, "time/training": 1.0})
        assert m is None
    assert sched.migrations == []


def test_live_submesh_migration(devices):
    """Shard params over a 4-chip submesh, migrate to the other 4 chips and
    to a 6-chip split; values identical, phase fn re-jits per mesh and reuses
    the cached executable when flipping back."""
    rules = [(r".*kernel", P("data", "model")), (r".*", P())]
    params = {
        "kernel": jnp.arange(64 * 8, dtype=jnp.float32).reshape(64, 8),
        "bias": jnp.ones((8,), jnp.float32),
    }

    mesh_a = submesh(devices, 0, 4, model_parallel=2)
    mesh_b = submesh(devices, 4, 4, model_parallel=2)
    mesh_c = submesh(devices, 0, 6, model_parallel=2)

    p_a = migrate_sharded_state(params, mesh_a, rules)
    used_a = {d.id for d in p_a["kernel"].sharding.device_set}
    assert used_a == {0, 1, 2, 3}

    p_b = migrate_sharded_state(p_a, mesh_b, rules)
    used_b = {d.id for d in p_b["kernel"].sharding.device_set}
    assert used_b == {4, 5, 6, 7}
    np.testing.assert_array_equal(np.asarray(p_b["kernel"]),
                                  np.asarray(params["kernel"]))

    p_c = migrate_sharded_state(p_b, mesh_c, rules)
    assert {d.id for d in p_c["kernel"].sharding.device_set} == set(range(6))

    # migratable phase fn: compile-per-mesh with cache
    builds = []

    def build(mesh):
        builds.append(mesh)

        @jax.jit
        def fwd(p, x):
            return x @ p["kernel"] + p["bias"]

        return fwd

    get_phase = make_migratable_phase(build)
    x = jnp.ones((2, 64), jnp.float32)
    y_a = get_phase(mesh_a)(p_a, x)
    y_b = get_phase(mesh_b)(p_b, x)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), rtol=1e-6)
    assert len(builds) == 2
    get_phase(mesh_a)   # cache hit, no rebuild
    assert len(builds) == 2


def test_standby_migrator_aot(devices):
    """StandbyMigrator (VERDICT r4 item 5): AOT-compiles the train step for
    a candidate split in the background; migrate() runs the precompiled
    executable after a delta reshard and matches the plain-jit result."""
    import numpy as np

    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm import model as M
    from rlinf_tpu.parallel import MeshConfig, make_mesh
    from rlinf_tpu.parallel.dynamic_scheduler import (
        StandbyMigrator, migrate_sharded_state, reshard_delta,
    )
    from rlinf_tpu.training.learner import (
        PolicyLossConfig, make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )

    cfg = LLMConfig.tiny(max_seq_len=64)
    tx = make_optimizer(OptimizerConfig(lr=1e-4))
    rules = M.partition_rules()
    mesh_a = make_mesh(MeshConfig(data=-1), jax.devices()[:4])
    mesh_b = make_mesh(MeshConfig(data=-1, tensor=2), jax.devices()[4:8])

    state = create_train_state(
        lambda r: init_params(cfg, r), tx, jax.random.PRNGKey(0),
        mesh=mesh_a, partition_rules=rules,
    )
    r = np.random.default_rng(0)
    B, T = 8, 32
    batch = {
        "input_ids": jnp.asarray(r.integers(0, 256, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "target_ids": jnp.asarray(r.integers(0, 256, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }

    def build(mesh):
        return make_policy_train_step(
            cfg, PolicyLossConfig(logprob_chunk_size=32), tx, mesh=mesh)

    mig = StandbyMigrator(build, rules)
    mig.prepare(mesh_b, state, batch, block=True)
    assert mig.ready(mesh_b)

    # oracle: plain jit path on mesh_b
    ref_state = migrate_sharded_state(state, mesh_b, rules)
    ref_state, ref_m = build(mesh_b)(ref_state, batch)
    new_state, m = mig.migrate(mesh_b, state, batch)
    np.testing.assert_allclose(
        float(m["actor/loss"]), float(ref_m["actor/loss"]), rtol=1e-5)
    # state landed on mesh_b devices
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert set(leaf.sharding.device_set) <= set(mesh_b.devices.flat)


def test_reshard_delta_skips_equivalent(devices):
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    from rlinf_tpu.parallel import MeshConfig, make_mesh
    from rlinf_tpu.parallel.dynamic_scheduler import reshard_delta

    mesh_a = make_mesh(MeshConfig(data=1), jax.devices()[:1])
    mesh_b = make_mesh(MeshConfig(data=1, tensor=1), jax.devices()[:1])
    x = jax.device_put(jnp.ones((8, 8)), NamedSharding(mesh_a, P()))
    out = reshard_delta([x], [NamedSharding(mesh_b, P())])
    # single-device relabels are placement-equivalent: same buffer
    assert out[0] is x
    # a real move is not skipped
    mesh_c = make_mesh(MeshConfig(data=1), jax.devices()[1:2])
    out2 = reshard_delta([x], [NamedSharding(mesh_c, P())])
    assert out2[0] is not x
    assert set(out2[0].sharding.device_set) == {jax.devices()[1]}
