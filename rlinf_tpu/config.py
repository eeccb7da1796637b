"""Dataclass + YAML config system with dot-path overrides and validators.

Replaces the reference's Hydra/OmegaConf stack (reference rlinf/config.py:1357
validate_cfg dispatcher + per-task validators at :265-1301). Configs are
plain frozen dataclasses — jit-static by construction — loaded from YAML and
overridable with ``key.subkey=value`` strings (the Hydra CLI analog).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.lora import LoRAConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.parallel.mesh import MeshConfig
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig


@dataclasses.dataclass(frozen=True)
class AlgorithmConfig:
    """Mirrors the reference's ``algorithm`` YAML group."""

    adv_type: str = "grpo"              # grpo | gae | reinpp | raw | opd
    loss_type: str = "actor"            # registry name
    group_size: int = 8
    normalize_advantages: bool = True
    recompute_logprobs: bool = False    # use fp32 recompute as old_logprobs
    use_ref_logprobs: bool = False      # KL vs frozen reference policy
    gamma: float = 1.0
    gae_lambda: float = 1.0


@dataclasses.dataclass(frozen=True)
class RunnerConfig:
    task_type: str = "reasoning"
    max_steps: int = 100
    seed: int = 0
    log_dir: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    save_interval: int = 50
    resume: str = "auto"                # auto | none
    num_mini_batches: int = 1           # minibatches per rollout batch
    num_epochs: int = 1                 # PPO epochs over the rollout batch
    rollout_batch_size: int = 64        # prompts per step (pre group_size)


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    """Rollout/serving engine selection (the reference's ``rollout`` YAML
    group: rollout.backend sglang|vllm|hf + engine knobs,
    reference rlinf/config.py:464).

    engine:
      auto        static under a mesh (sharded batch generation), continuous
                  otherwise
      static      one jitted generate() per (P, N) bucket — best for uniform
                  lengths / sharded DP rollout
      continuous  slot-pool continuous batching (SGLang analog) — best for
                  mixed-length prompts, long-tail decode
      paged       continuous + paged KV pool (HBM ∝ live tokens)
    weight_quant: "auto" = int8 weight-only decode on TPU, none elsewhere.
    """

    engine: str = "auto"             # auto | static | continuous | paged
    weight_quant: str = "auto"       # auto | none | int8
    num_slots: int = 32              # continuous/paged slot-pool size
    decode_chunk: int = 16           # decode steps per host round
    prompt_bucket: int = 64
    page_size: int = 16              # paged engine only
    decode_attn_impl: Optional[str] = None   # None = pallas on TPU, xla off


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_path: Optional[str] = None
    max_prompt_len: int = 512
    max_examples: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    model: LLMConfig = dataclasses.field(default_factory=LLMConfig.tiny)
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    loss: PolicyLossConfig = dataclasses.field(default_factory=PolicyLossConfig)
    algorithm: AlgorithmConfig = dataclasses.field(default_factory=AlgorithmConfig)
    runner: RunnerConfig = dataclasses.field(default_factory=RunnerConfig)
    rollout: RolloutConfig = dataclasses.field(default_factory=RolloutConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    lora: LoRAConfig = dataclasses.field(default_factory=LoRAConfig)
    num_microbatches: int = 1
    remat: bool = True
    attn_impl: str = "xla"


_SECTION_TYPES = {
    "model": LLMConfig,
    "sampling": SamplingParams,
    "optimizer": OptimizerConfig,
    "loss": PolicyLossConfig,
    "algorithm": AlgorithmConfig,
    "runner": RunnerConfig,
    "rollout": RolloutConfig,
    "data": DataConfig,
    "mesh": MeshConfig,
    "lora": LoRAConfig,
}


def _build_section(cls, data: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"Unknown keys for {cls.__name__}: {sorted(unknown)}")
    coerced = {}
    for key, val in data.items():
        ftype = fields[key].type
        # PyYAML 1.1 parses "3e-4" as a string; coerce to declared numerics.
        if isinstance(val, str):
            if ftype in ("float", float, "Optional[float]"):
                try:
                    val = float(val)
                except ValueError:
                    pass
            elif ftype in ("int", int, "Optional[int]"):
                try:
                    val = int(val)
                except ValueError:
                    pass
        coerced[key] = val
    return cls(**coerced)


def config_from_dict(data: Dict[str, Any], validate: bool = True) -> TrainerConfig:
    kwargs: Dict[str, Any] = {}
    for key, val in data.items():
        if key in _SECTION_TYPES:
            kwargs[key] = _build_section(_SECTION_TYPES[key], val or {})
        else:
            kwargs[key] = val
    cfg = _build_section(TrainerConfig, kwargs)
    if validate:
        validate_config(cfg)
    return cfg


def config_to_dict(cfg: TrainerConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def load_config(
    path: Optional[str] = None, overrides: Optional[list] = None
) -> TrainerConfig:
    """Load YAML + apply ``a.b=c`` overrides (values parsed as YAML scalars)."""
    data: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        val = yaml.safe_load(raw)
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return config_from_dict(data)


def validate_config(cfg: TrainerConfig):
    """Cross-field checks (reference validate_cfg analog)."""
    r, a = cfg.runner, cfg.algorithm
    total = r.rollout_batch_size * a.group_size
    if total % r.num_mini_batches != 0:
        raise ValueError(
            f"rollout_batch_size*group_size ({total}) must divide evenly into "
            f"num_mini_batches ({r.num_mini_batches})"
        )
    mini = total // r.num_mini_batches
    if mini % cfg.num_microbatches != 0:
        raise ValueError(
            f"minibatch size ({mini}) not divisible by num_microbatches "
            f"({cfg.num_microbatches})"
        )
    if a.adv_type == "grpo" and a.group_size < 2:
        raise ValueError("GRPO requires group_size >= 2")
    if cfg.sampling.max_new_tokens < 1:
        raise ValueError("max_new_tokens must be >= 1")
    ro = cfg.rollout
    if ro.engine not in ("auto", "static", "continuous", "paged"):
        raise ValueError(f"unknown rollout.engine: {ro.engine!r}")
    if ro.weight_quant not in ("auto", "none", "int8"):
        raise ValueError(f"unknown rollout.weight_quant: {ro.weight_quant!r}")
    if ro.engine == "paged" and ro.prompt_bucket % ro.page_size != 0:
        raise ValueError(
            f"rollout.prompt_bucket ({ro.prompt_bucket}) must be a multiple "
            f"of rollout.page_size ({ro.page_size})"
        )
