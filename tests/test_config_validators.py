"""Per-task config validators (reference rlinf/config.py:1252-1301 analog):
bad batch/DP combos, dtype mismatches, mesh-vs-model inconsistencies must be
rejected at load time with actionable messages."""

import pytest

from rlinf_tpu.config import config_from_dict, load_config


def _cfg(**sections):
    base = {"model": {"vocab_size": 64, "hidden_size": 16,
                      "intermediate_size": 32, "num_layers": 2,
                      "num_heads": 4, "num_kv_heads": 2, "max_seq_len": 512}}
    for k, v in sections.items():
        base.setdefault(k, {}).update(v) if isinstance(v, dict) else base.update({k: v})
    return base


def test_valid_config_passes():
    config_from_dict(_cfg())


def test_batch_not_divisible_by_minibatches():
    with pytest.raises(ValueError, match="num_mini_batches"):
        config_from_dict(_cfg(runner={"rollout_batch_size": 5,
                                      "num_mini_batches": 3},
                              algorithm={"group_size": 1, "adv_type": "raw"}))


def test_unknown_dtype_rejected():
    with pytest.raises(ValueError, match="model.dtype"):
        config_from_dict(_cfg(model={"dtype": "float64"}))


def test_gqa_head_divisibility():
    with pytest.raises(ValueError, match="num_kv_heads"):
        config_from_dict(_cfg(model={"num_heads": 5, "num_kv_heads": 2}))


def test_tensor_axis_must_divide_heads():
    with pytest.raises(ValueError, match="mesh.tensor"):
        config_from_dict(_cfg(mesh={"tensor": 3, "data": 1}))


def test_context_axis_must_divide_seq():
    with pytest.raises(ValueError, match="mesh.context"):
        config_from_dict(_cfg(model={"max_seq_len": 900},
                              mesh={"context": 8, "data": 1}))


def test_expert_axis_requires_moe():
    with pytest.raises(ValueError, match="mesh.expert"):
        config_from_dict(_cfg(mesh={"expert": 2, "data": 1}))


def test_expert_axis_must_divide_experts():
    with pytest.raises(ValueError, match="num_experts"):
        config_from_dict(_cfg(model={"num_experts": 6},
                              mesh={"expert": 4, "data": 1}))


def test_dp_degree_must_divide_global_batch():
    with pytest.raises(ValueError, match="data-parallel degree"):
        config_from_dict(_cfg(mesh={"data": 4, "fsdp": 1},
                              runner={"rollout_batch_size": 3},
                              algorithm={"group_size": 2}))


def test_grpo_needs_groups():
    with pytest.raises(ValueError, match="group_size >= 2"):
        config_from_dict(_cfg(algorithm={"adv_type": "grpo", "group_size": 1}))


def test_unknown_task_type():
    with pytest.raises(ValueError, match="task_type"):
        config_from_dict(_cfg(runner={"task_type": "quantum"}))


def test_gen_longer_than_model():
    with pytest.raises(ValueError, match="max_seq_len"):
        config_from_dict(_cfg(sampling={"max_new_tokens": 600}))


def test_lora_gae_conflict():
    with pytest.raises(ValueError, match="LoRA"):
        config_from_dict(_cfg(lora={"enabled": True},
                              algorithm={"adv_type": "gae"}))


def test_moe_impl_validated():
    with pytest.raises(ValueError, match="moe_impl"):
        config_from_dict(_cfg(model={"num_experts": 4,
                                     "moe_impl": "magic"}))


def test_negative_temperature():
    with pytest.raises(ValueError, match="temperature"):
        config_from_dict(_cfg(sampling={"temperature": 0.0}))


def test_demo_yaml_still_valid():
    load_config("examples/reasoning/config/grpo_demo_tiny.yaml")
    load_config("examples/reasoning/config/grpo_math_qwen05b.yaml")
