"""Replay buffer: capacity, weighted sampling, persistence/restore."""

import numpy as np
import pytest

from rlinf_tpu.data.replay_buffer import ReplayBuffer


def _traj(rng, n=5):
    return {
        "obs": rng.normal(size=(n, 4)).astype(np.float32),
        "actions": rng.normal(size=(n, 2)).astype(np.float32),
        "rewards": rng.normal(size=(n,)).astype(np.float32),
    }


def test_capacity_eviction():
    rng = np.random.default_rng(0)
    buf = ReplayBuffer(capacity=3)
    for i in range(5):
        buf.add(_traj(rng), meta={"i": i})
    assert len(buf) == 3
    assert buf.total_transitions == 15


def test_weighted_sampling():
    rng = np.random.default_rng(1)
    buf = ReplayBuffer(capacity=10, seed=0)
    buf.add({"x": np.zeros((1, 1))}, weight=0.001)
    buf.add({"x": np.ones((1, 1))}, weight=1000.0)
    samples = buf.sample(100)
    mean = np.mean([s.data["x"][0, 0] for s in samples])
    assert mean > 0.95  # heavy item dominates


def test_sample_transitions_shapes():
    rng = np.random.default_rng(2)
    buf = ReplayBuffer(capacity=10)
    for _ in range(4):
        buf.add(_traj(rng, n=7))
    batch = buf.sample_transitions(32)
    assert batch["obs"].shape == (32, 4)
    assert batch["actions"].shape == (32, 2)
    assert batch["rewards"].shape == (32,)


def test_empty_sampling_raises():
    buf = ReplayBuffer()
    with pytest.raises(ValueError):
        buf.sample(1)


def test_persist_and_restore(tmp_path):
    rng = np.random.default_rng(3)
    buf = ReplayBuffer(capacity=5, directory=str(tmp_path), flush_async=True)
    trajs = [_traj(rng) for _ in range(7)]
    for t in trajs:
        buf.add(t, weight=2.0)
    buf.flush()

    buf2 = ReplayBuffer.restore(str(tmp_path), capacity=5)
    assert len(buf2) == 5  # only surviving items persisted in the index
    sample = buf2.sample(1)[0]
    assert sample.weight == 2.0
    # restored items match one of the stored trajectories exactly
    match = any(
        np.allclose(sample.data["obs"], t["obs"]) for t in trajs
    )
    assert match
    # adding continues the id sequence
    buf2.add(_traj(rng))
    assert len(buf2) == 5
