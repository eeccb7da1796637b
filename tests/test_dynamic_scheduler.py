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
