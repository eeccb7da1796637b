"""Native C++ batching kernels: exact parity with the Python reference
implementations + speedup sanity (rlinf_tpu/native/)."""

import time

import numpy as np
import pytest

from rlinf_tpu.data.dynamic_batching import best_fit_decreasing
from rlinf_tpu.native import (
    bfd_partition,
    ffd_pack,
    native_available,
    pack_sequences,
)


def test_native_builds():
    assert native_available(), "native lib failed to build (g++ present?)"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bfd_matches_python_exactly(seed):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, 500, size=400).tolist()
    want = best_fit_decreasing(lengths, 1024)
    got = bfd_partition(lengths, 1024)
    assert got == want


def test_bfd_oversize_rows_get_singletons():
    bins = bfd_partition([10, 2000, 5], 100)
    flat = sorted(i for b in bins for i in b)
    assert flat == [0, 1, 2]
    assert [1] in bins   # the oversize row is alone
    for b in bins:
        if 1 not in b:
            assert sum([10, 2000, 5][i] for i in b) <= 100


def test_ffd_pack_valid_layout():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 300, size=200)
    cap = 512
    rows, row_ids, offsets = ffd_pack(lengths, cap)
    # no overlap, no overflow
    occupancy = np.zeros((rows, cap), bool)
    for i, L in enumerate(lengths):
        r, o = int(row_ids[i]), int(offsets[i])
        assert o + L <= cap
        assert not occupancy[r, o:o + L].any()
        occupancy[r, o:o + L] = True
    # packing efficiency: FFD is within 1.7x of the fractional lower bound
    assert rows <= int(np.ceil(lengths.sum() / cap) * 1.7) + 1


def test_pack_sequences_roundtrip():
    rng = np.random.default_rng(1)
    n, T = 40, 64
    lengths = rng.integers(1, T + 1, size=n)
    ids = np.zeros((n, T), np.int32)
    mask = np.zeros((n, T), bool)
    for i, L in enumerate(lengths):
        ids[i, :L] = rng.integers(1, 1000, size=L)
        mask[i, :L] = True
    packed, row_ids, offsets = pack_sequences(
        {"ids": ids, "mask": mask}, lengths, capacity=128)
    # every token lands where the plan says, nothing lost
    assert packed["mask"].sum() == mask.sum()
    for i, L in enumerate(lengths):
        r, o = int(row_ids[i]), int(offsets[i])
        np.testing.assert_array_equal(
            packed["ids"][r, o:o + L], ids[i, :L])


def test_native_speedup_over_python():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 2000, size=5000).tolist()

    t0 = time.perf_counter()
    bfd_partition(lengths, 8192)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    best_fit_decreasing(lengths, 8192)
    t_python = time.perf_counter() - t0

    # informational bound — native must at least clearly win
    assert t_native < t_python / 5, (t_native, t_python)
