"""Device mesh construction and component placement.

TPU-native analog of the reference's cluster + placement layer
(reference: rlinf/scheduler/cluster/cluster.py:110, rlinf/scheduler/placement/
packed.py:22, rlinf/utils/placement.py:99 ModelParallelComponentPlacement with
modes COLLOCATED / DISAGGREGATED / HYBRID / AUTO at rlinf/utils/placement.py:28).

Where the reference packs Ray actors onto GPU index ranges parsed from YAML
(``cluster.component_placement: {actor: 0-7, rollout: 4-7}``), here each
component gets a :class:`jax.sharding.Mesh` over a subset of devices with
named logical axes. Two devices-sets relationships reproduce the reference's
execution modes:

* COLLOCATED  — components share the same device set; the driver time-slices
  phases (rollout, then training) on one mesh.  Weight "sync" is passing the
  params pytree between jitted functions (possibly resharded with
  ``jax.device_put``) — the analog of the reference's CUDA-IPC fast path.
* DISAGGREGATED — components own disjoint device sets; weight sync is a
  cross-mesh ``jax.device_put`` (ICI within a slice, DCN across hosts) — the
  analog of the reference's NCCL p2p bucket send
  (rlinf/workers/actor/megatron_actor_worker.py:380).
"""

from __future__ import annotations

import dataclasses
import math
from enum import Enum
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


class AxisNames:
    """Canonical logical mesh axis names used throughout the framework.

    The reference's 5D parallelism (TP/DP/PP/SP/CP, docs 5D.rst) maps to:
      DP   -> ``data``   (batch sharding; also FSDP-style param sharding via
                          ``fsdp`` when separated)
      TP   -> ``tensor`` (matmul/vocab sharding; XLA inserts the all-reduces
                          the reference gets from Megatron column/row linears)
      CP   -> ``context``(sequence sharding for ring attention)
      EP   -> ``expert`` (MoE expert sharding)
      PP   -> intentionally absent: on TPU slices DPxTP over ICI replaces
              pipeline stages (SURVEY.md §2.8).
    """

    DATA = "data"
    FSDP = "fsdp"
    TENSOR = "tensor"
    CONTEXT = "context"
    EXPERT = "expert"

    ALL = (DATA, FSDP, TENSOR, CONTEXT, EXPERT)
    #: Axes over which batch entries are split (used for data sharding specs).
    BATCH = (DATA, FSDP)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Sizes of each logical axis; ``-1`` means "absorb remaining devices".

    Mirrors the reference's per-component parallel config
    (``tensor_model_parallel_size`` etc., rlinf/utils/initialize.py:312) but as
    mesh geometry rather than process-group construction.
    """

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    context: int = 1
    expert: int = 1

    def resolve(self, num_devices: int) -> "MeshConfig":
        """Fill the single -1 axis so the product equals ``num_devices``."""
        sizes = dataclasses.asdict(self)
        unknown = [k for k, v in sizes.items() if v == -1]
        if len(unknown) > 1:
            raise ValueError(f"At most one mesh axis may be -1, got {unknown}")
        known = math.prod(v for v in sizes.values() if v != -1)
        if unknown:
            if num_devices % known != 0:
                raise ValueError(
                    f"{num_devices} devices not divisible by fixed axes product {known}"
                )
            sizes[unknown[0]] = num_devices // known
        elif known != num_devices:
            raise ValueError(
                f"Mesh axes product {known} != available devices {num_devices}"
            )
        return MeshConfig(**sizes)

    @property
    def axis_sizes(self) -> Dict[str, int]:
        return {
            AxisNames.DATA: self.data,
            AxisNames.FSDP: self.fsdp,
            AxisNames.TENSOR: self.tensor,
            AxisNames.CONTEXT: self.context,
            AxisNames.EXPERT: self.expert,
        }


def make_mesh(
    config: MeshConfig,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named :class:`Mesh` from a :class:`MeshConfig`.

    Axis order is chosen so the fastest-varying (innermost, most
    ICI-bandwidth-hungry) axis is ``tensor``: TP collectives happen per-layer
    and must ride the tightest ICI loop; ``data`` varies slowest since DP
    gradients all-reduce only once per step.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    cfg = config.resolve(len(devices))
    shape = (cfg.data, cfg.fsdp, cfg.expert, cfg.context, cfg.tensor)
    names = (
        AxisNames.DATA,
        AxisNames.FSDP,
        AxisNames.EXPERT,
        AxisNames.CONTEXT,
        AxisNames.TENSOR,
    )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


class PlacementMode(Enum):
    """Execution-mode analog of reference rlinf/utils/placement.py:28."""

    COLLOCATED = "collocated"
    DISAGGREGATED = "disaggregated"
    HYBRID = "hybrid"


def _parse_range(spec) -> List[int]:
    """Parse '0-7', '0,2,4', 'all', or int/list specs into device indices.

    Mirrors the YAML range syntax of reference
    ``cluster.component_placement`` (rlinf/utils/placement.py:99).
    """
    if isinstance(spec, int):
        return [spec]
    if isinstance(spec, (list, tuple)):
        return [int(x) for x in spec]
    spec = str(spec).strip()
    if spec == "all":
        return list(range(len(jax.devices())))
    out: List[int] = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return out


@dataclasses.dataclass
class ComponentPlacement:
    """Maps named components to submeshes of the device inventory.

    Example (mirrors reference maniskill_ppo_openvlaoft.yaml:16-20)::

        placement = ComponentPlacement(
            components={"actor": "0-7", "rollout": "4-7"},
            mesh_configs={"actor": MeshConfig(tensor=2),
                          "rollout": MeshConfig()},
        )
        actor_mesh = placement.mesh("actor")

    Overlapping device sets => COLLOCATED (phase time-slicing); disjoint =>
    DISAGGREGATED (cross-mesh weight transfer).
    """

    components: Dict[str, object]
    mesh_configs: Dict[str, MeshConfig] = dataclasses.field(default_factory=dict)
    devices: Optional[Sequence[jax.Device]] = None

    def __post_init__(self):
        self._all_devices = (
            list(self.devices) if self.devices is not None else jax.devices()
        )
        self._indices: Dict[str, List[int]] = {
            name: _parse_range(spec) for name, spec in self.components.items()
        }
        for name, idx in self._indices.items():
            bad = [i for i in idx if i >= len(self._all_devices)]
            if bad:
                raise ValueError(
                    f"Component {name!r} requests device indices {bad} but only "
                    f"{len(self._all_devices)} devices exist"
                )
        self._meshes: Dict[str, Mesh] = {}

    def device_indices(self, component: str) -> List[int]:
        return list(self._indices[component])

    def mesh(self, component: str) -> Mesh:
        if component not in self._meshes:
            devs = [self._all_devices[i] for i in self._indices[component]]
            cfg = self.mesh_configs.get(component, MeshConfig())
            self._meshes[component] = make_mesh(cfg, devs)
        return self._meshes[component]

    @property
    def mode(self) -> PlacementMode:
        """COLLOCATED if all components share one device set, DISAGGREGATED if
        all-disjoint, HYBRID otherwise (partial overlap).

        Mirrors mode detection at reference rlinf/utils/placement.py:99-247.
        """
        sets = [frozenset(v) for v in self._indices.values()]
        if len(sets) <= 1 or all(s == sets[0] for s in sets):
            return PlacementMode.COLLOCATED
        disjoint = all(
            not (a & b)
            for i, a in enumerate(sets)
            for b in sets[i + 1 :]
        )
        if disjoint:
            return PlacementMode.DISAGGREGATED
        return PlacementMode.HYBRID

    def pairwise_overlap(self, a: str, b: str) -> Tuple[bool, bool]:
        """(share_all, share_any) between two components' device sets."""
        sa, sb = set(self._indices[a]), set(self._indices[b])
        return sa == sb, bool(sa & sb)
