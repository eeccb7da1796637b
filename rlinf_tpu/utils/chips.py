"""TPU hardware registry: per-generation chip specs + slice topology.

Reference analog: the accelerator abstraction layer
(reference rlinf/scheduler/hardware/accelerators/accelerator.py:115-268 —
AcceleratorType enum + per-vendor AcceleratorManager registry resolving
device counts, visibility env vars, and CCL backends for
NVIDIA/AMD/Ascend/Kunlun/MUSA/Intel). A TPU-native framework targets one
vendor but many *generations and slice shapes*, so the registry here
resolves: chip roofline numbers (MXU FLOP/s, HBM bytes/s — feeding
utils/flops.py speed-of-light models), ICI link bandwidth and wraparound
topology (feeding collective-cost models in utils/auto_placement.py), and
runtime detection from ``jax.devices()``.

No env-var plumbing is needed: JAX owns device visibility; the analog of
"CCL backend choice" is the ICI-vs-DCN distinction captured per-slice.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TPUChip:
    """Single-chip roofline + per-link ICI characteristics."""

    name: str
    generation: str
    bf16_flops: float        # peak MXU FLOP/s (bf16 in, fp32 acc)
    int8_flops: float        # peak int8 OP/s (0 when unsupported)
    hbm_bytes: float
    hbm_bw: float            # bytes/s
    ici_bw_per_link: float   # unidirectional bytes/s per ICI link
    ici_links: int           # ICI links per chip (torus degree)
    vmem_bytes: float = 128 * 2**20
    cores_per_chip: int = 1

    @property
    def arithmetic_intensity(self) -> float:
        """FLOP:byte break-even — ops below this are HBM-bound."""
        return self.bf16_flops / self.hbm_bw

    @property
    def ici_bw_total(self) -> float:
        return self.ici_bw_per_link * self.ici_links


# Public spec-sheet numbers (jax-ml.github.io/scaling-book part 2 mirrors
# the same table).
_CHIPS: Dict[str, TPUChip] = {}


def register_chip(chip: TPUChip) -> TPUChip:
    _CHIPS[chip.generation] = chip
    return chip


register_chip(TPUChip("tpu-v4", "v4", 275e12, 275e12, 32e9, 1228e9,
                      45e9, 6, cores_per_chip=2))
# v5e peak: 197 TFLOP/s bf16, 394 TOPS int8 (the 394/788 pair previously
# registered here was the int8/"sparse-ish" doubling — the same r1 mistake
# flops.py:24 documents; all roofline consumers now agree on 197).
register_chip(TPUChip("tpu-v5e", "v5e", 197e12, 394e12, 16e9, 819e9,
                      45e9, 4))
register_chip(TPUChip("tpu-v5p", "v5p", 459e12, 918e12, 95e9, 2765e9,
                      90e9, 6, cores_per_chip=2))
register_chip(TPUChip("tpu-v6e", "v6e", 918e12, 1836e12, 32e9, 1640e9,
                      90e9, 4))


def get_chip(generation: str) -> TPUChip:
    try:
        return _CHIPS[generation]
    except KeyError:
        raise KeyError(
            f"Unknown TPU generation {generation!r}; have {sorted(_CHIPS)}"
        ) from None


def detect_chip(default: str = "v5e") -> TPUChip:
    """Resolve the chip of the attached runtime from jax.devices().

    Mirrors the reference's AcceleratorManager.detect flow (probe the
    platform, fall back to a configured default) without vendor branching.
    """
    import jax

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower().replace(" ", "")
    # device_kind spellings seen in the wild: "TPU v4", "TPU v5 lite"
    # (= v5e), "TPU v5p", "TPU v5", "TPU v6 lite" (= v6e)
    aliases = {"v5lite": "v5e", "v5litepod": "v5e", "v6lite": "v6e"}
    for alias, gen in aliases.items():
        if alias in kind:
            return _CHIPS[gen]
    for gen in _CHIPS:
        if gen in kind:
            return _CHIPS[gen]
    return _CHIPS[default]


@dataclasses.dataclass(frozen=True)
class SliceTopology:
    """A TPU slice: chip grid + which mesh axes ride ICI vs DCN.

    The reference encodes "which GPUs are NVLink-local vs cross-node" in
    its placement strategies (reference rlinf/scheduler/placement/packed.py
    stride logic); on TPU the analog is the physical torus shape — axes
    mapped within one slice use ICI, the host/pod axis uses DCN.
    """

    chip: TPUChip
    mesh_shape: Tuple[int, ...]          # chips per torus dim, e.g. (4, 4)
    wraparound: Tuple[bool, ...] = ()    # torus wrap per dim (>= 4 chips)
    dcn_bw_per_host: float = 25e9        # bytes/s

    @property
    def num_chips(self) -> int:
        return int(math.prod(self.mesh_shape))

    def axis_bandwidth(self, dim: int) -> float:
        """All-reduce-usable bandwidth along one torus dim: bidirectional,
        doubled again by wraparound (two directions around the ring)."""
        wrap = self.wraparound[dim] if dim < len(self.wraparound) else (
            self.mesh_shape[dim] >= 4
        )
        return self.chip.ici_bw_per_link * 2 * (2 if wrap else 1)

    def all_reduce_time(self, bytes_per_chip: float, dim: int = 0) -> float:
        """Ring all-reduce lower bound along one torus dim."""
        n = self.mesh_shape[dim]
        if n <= 1:
            return 0.0
        return 2 * bytes_per_chip * (n - 1) / n / self.axis_bandwidth(dim)

    def all_gather_time(self, bytes_per_chip: float, dim: int = 0) -> float:
        """Ring all-gather lower bound: each chip forwards (n-1)/n of the
        full gathered array (= half an all-reduce)."""
        n = self.mesh_shape[dim]
        if n <= 1:
            return 0.0
        return bytes_per_chip * (n - 1) / n / self.axis_bandwidth(dim)


def slice_for(generation: str, num_chips: int,
              dcn_bw_per_host: float = 25e9) -> SliceTopology:
    """Standard slice shape for a chip count (squarish 2D torus, the
    shapes TPU pods actually ship: 2x2, 2x4, 4x4, 4x8, 8x8, ...)."""
    chip = get_chip(generation)
    a = 2 ** (int(math.log2(max(num_chips, 1))) // 2)
    b = max(num_chips // a, 1)
    return SliceTopology(chip, (a, b), dcn_bw_per_host=dcn_bw_per_host)
