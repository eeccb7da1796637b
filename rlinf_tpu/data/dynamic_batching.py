"""Dynamic token-budget microbatching with shape bucketing.

Reference analog: ``enable_dynamic_batch_size`` + ``max_tokens_per_mbs`` with
best-fit-decreasing partitioning (reference rlinf/utils/data_iter_utils.py:
447-487) and BatchResizingIterator (rlinf/data/io_struct.py:1646). The jit
twist (SURVEY.md §5.7 "hard parts"): microbatch shapes must come from a small
set of buckets or every step recompiles. Each packed microbatch is therefore
padded to (row-bucket, seq-bucket); loss normalization uses the GLOBAL valid
token count so packing does not change gradients (valid_token_scale
semantics, reference megatron_worker.py:644).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def best_fit_decreasing(
    lengths: Sequence[int], max_tokens: int
) -> List[List[int]]:
    """Partition row indices into bins with sum(length) <= max_tokens each.

    Rows longer than max_tokens get singleton bins (they must still run).
    """
    # stable sort so tie order is deterministic (and matches the native
    # implementation in rlinf_tpu/native/src/batching.cc bit-for-bit)
    order = np.argsort(lengths, kind="stable")[::-1]
    bins: List[Tuple[int, List[int]]] = []  # (used_tokens, indices)
    for i in order:
        L = int(lengths[i])
        best, best_left = None, None
        for b, (used, idx) in enumerate(bins):
            left = max_tokens - used - L
            if left >= 0 and (best_left is None or left < best_left):
                best, best_left = b, left
        if best is None:
            bins.append((L, [int(i)]))
        else:
            used, idx = bins[best]
            idx.append(int(i))
            bins[best] = (used + L, idx)
    return [idx for _, idx in bins]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _row_bucket(n: int) -> int:
    """Next power of two: bounds distinct compiled batch shapes to log2."""
    return 1 << int(np.ceil(np.log2(max(n, 1))))


def pack_microbatches(
    batch: Dict[str, np.ndarray],
    lengths: Sequence[int],
    max_tokens: int,
    *,
    seq_bucket: int = 128,
    length_key: str = "attention_mask",
) -> List[Dict[str, np.ndarray]]:
    """Split a [B, T] batch dict into token-budget microbatches.

    Each microbatch is trimmed to its own bucketed max length and padded to a
    power-of-two row count (padding rows have empty masks, contributing zero
    loss/grad under global-count normalization).
    """
    B, T = batch[length_key].shape
    try:  # native C++ partitioner (identical output); lazy to avoid cycle
        from rlinf_tpu.native import bfd_partition, native_available

        bins = (bfd_partition(lengths, max_tokens) if native_available()
                else best_fit_decreasing(lengths, max_tokens))
    except ImportError:
        bins = best_fit_decreasing(lengths, max_tokens)
    out = []
    for idx in bins:
        idx_arr = np.asarray(sorted(idx))
        rows = len(idx_arr)
        rows_b = _row_bucket(rows)
        max_len = int(max(lengths[i] for i in idx))
        T_b = min(_round_up(max_len, seq_bucket), T)
        mb = {}
        for k, v in batch.items():
            sliced = v[idx_arr][:, :T_b] if v.ndim >= 2 else v[idx_arr]
            if rows_b > rows:
                pad_shape = (rows_b - rows, *sliced.shape[1:])
                sliced = np.concatenate(
                    [sliced, np.zeros(pad_shape, sliced.dtype)], axis=0
                )
            mb[k] = sliced
        out.append(mb)
    return out
