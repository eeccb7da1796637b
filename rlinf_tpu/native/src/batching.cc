// Native batching kernels: token-budget partitioning + sequence packing.
//
// Reference analog: the host-side batch plumbing the reference spends
// utils/data_iter_utils.py (718 LoC) + data/io_struct.py BatchResizingIterator
// on — best-fit-decreasing token partitioning (data_iter_utils.py:447-487)
// runs per training step over every rollout sequence, and at production batch
// sizes (tens of thousands of variable-length rows per step) the O(n * bins)
// Python loop becomes step-time. These C++ versions keep identical outputs
// (bit-for-bit bin assignments vs rlinf_tpu/data/dynamic_batching.py) at
// ~100x the speed, exposed through ctypes (rlinf_tpu/native/__init__.py).
//
// Build: g++ -O3 -shared -fPIC (rlinf_tpu/native/build.py, cached by source
// hash; Python fallback is always available).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Best-fit-decreasing partition of rows into bins with sum(length) <=
// max_tokens. Semantics identical to dynamic_batching.best_fit_decreasing:
//   * rows processed in decreasing length; ties broken by LARGER original
//     index first (numpy argsort-ascending reversed),
//   * each row goes to the open bin with the smallest non-negative leftover
//     (first such bin on ties),
//   * rows longer than max_tokens get singleton bins.
// Outputs bin id per row in `bin_ids` (bins numbered in creation order);
// returns the number of bins.
int64_t bfd_partition(const int64_t* lengths, int64_t n, int64_t max_tokens,
                      int64_t* bin_ids) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  // ascending stable sort, then reverse == numpy argsort()[::-1]
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return lengths[a] < lengths[b]; });
  std::reverse(order.begin(), order.end());

  std::vector<int64_t> used;  // tokens used per bin
  used.reserve(64);
  for (int64_t k = 0; k < n; ++k) {
    const int64_t i = order[k];
    const int64_t L = lengths[i];
    int64_t best = -1;
    int64_t best_left = -1;
    for (size_t b = 0; b < used.size(); ++b) {
      const int64_t left = max_tokens - used[b] - L;
      if (left >= 0 && (best < 0 || left < best_left)) {
        best = static_cast<int64_t>(b);
        best_left = left;
      }
    }
    if (best < 0) {
      used.push_back(L);
      bin_ids[i] = static_cast<int64_t>(used.size()) - 1;
    } else {
      used[best] += L;
      bin_ids[i] = best;
    }
  }
  return static_cast<int64_t>(used.size());
}

// First-fit-decreasing sequence packing into fixed-capacity rows (the SFT
// sequence-packing layout). Same ordering convention as bfd_partition.
// Returns the number of packed rows; fills `row_ids` (packed row per
// sequence) and `offsets` (start column of each sequence within its row).
int64_t ffd_pack(const int64_t* lengths, int64_t n, int64_t capacity,
                 int64_t* row_ids, int64_t* offsets) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return lengths[a] < lengths[b]; });
  std::reverse(order.begin(), order.end());

  std::vector<int64_t> used;
  used.reserve(64);
  for (int64_t k = 0; k < n; ++k) {
    const int64_t i = order[k];
    const int64_t L = lengths[i];
    int64_t row = -1;
    for (size_t r = 0; r < used.size(); ++r) {
      if (used[r] + L <= capacity) {
        row = static_cast<int64_t>(r);
        break;
      }
    }
    if (row < 0) {
      used.push_back(0);
      row = static_cast<int64_t>(used.size()) - 1;
    }
    row_ids[i] = row;
    offsets[i] = used[row];
    used[row] += L;
  }
  return static_cast<int64_t>(used.size());
}

// Flat gather plan for packing ragged rows [i, :lengths[i]] of a padded
// [n, stride] matrix into packed rows of width `capacity`:
//   dst[row_ids[i], offsets[i] + t] = src[i, t]  for t < lengths[i]
// Emits parallel index arrays (src_flat, dst_flat) of total length
// sum(lengths) so Python applies ONE fancy-index assignment instead of a
// per-sequence loop. Returns total copied elements.
int64_t pack_gather_plan(const int64_t* lengths, int64_t n, int64_t stride,
                         int64_t capacity, const int64_t* row_ids,
                         const int64_t* offsets, int64_t* src_flat,
                         int64_t* dst_flat) {
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t base_src = i * stride;
    const int64_t base_dst = row_ids[i] * capacity + offsets[i];
    for (int64_t t = 0; t < lengths[i]; ++t) {
      src_flat[m] = base_src + t;
      dst_flat[m] = base_dst + t;
      ++m;
    }
  }
  return m;
}

}  // extern "C"
