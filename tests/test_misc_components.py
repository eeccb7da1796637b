"""Channels, code verifier, QA metrics, HF export roundtrip, eval runner,
agent runner mechanics."""

import numpy as np
import jax
import pytest

from rlinf_tpu.parallel.channel import Channel


@pytest.fixture(autouse=True)
def _reset_channels():
    Channel.reset_registry()
    yield
    Channel.reset_registry()


def test_channel_put_get_keys():
    ch = Channel.create("rollout")
    ch.put({"x": 1}, key="a")
    ch.put({"x": 2}, key="b")
    assert Channel.connect("rollout") is ch
    assert ch.get(key="b")["x"] == 2
    assert ch.get(key="a")["x"] == 1
    with pytest.raises(ValueError):
        Channel.create("rollout")
    with pytest.raises(KeyError):
        Channel.connect("nope")


def test_channel_weighted_batch():
    ch = Channel.create("tok")
    for i, w in enumerate([100, 200, 300, 400]):
        ch.put(i, weight=w)
    batch = ch.get_batch(target_weight=450)
    assert batch == [0, 1, 2]  # 100+200+300 >= 450
    assert ch.qsize() == 1


def test_code_verifier():
    from rlinf_tpu.algorithms.rewards.code_verifier import (
        code_reward, extract_code,
    )

    sol = """Here is my solution:
```python
a, b = map(int, input().split())
print(a + b)
```
"""
    tests = [
        {"input": "2 3", "output": "5"},
        {"input": "10 -4", "output": "6"},
    ]
    assert code_reward(sol, tests) == 1.0
    assert code_reward(sol, [{"input": "2 3", "output": "6"}]) == 0.0
    bad = "```python\nwhile True: pass\n```"
    assert code_reward(bad, tests, timeout_s=1.0) == 0.0
    assert extract_code("no code at all") is None
    # partial credit
    half = code_reward(
        sol, tests + [{"input": "1 1", "output": "3"}], partial_credit=True
    )
    assert abs(half - 2 / 3) < 1e-9


def test_qa_metrics():
    from rlinf_tpu.algorithms.rewards.qa_metrics import (
        batch_em_rewards, exact_match, extract_final_answer, f1_score,
    )

    assert exact_match("The Eiffel Tower!", "eiffel tower") == 1.0
    assert f1_score("paris france", "paris") > 0.6
    assert extract_final_answer("blah <answer>42</answer> done") == "42"
    assert batch_em_rewards(
        ["reasoning...\n<answer>Paris</answer>"], ["paris"]
    ) == [1.0]


def test_hf_export_roundtrip():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from rlinf_tpu.models.llm import LLMConfig, params_from_hf_state_dict
    from rlinf_tpu.models.llm.hf_import import params_to_hf_state_dict

    hf_cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = LLMConfig.from_hf_config(hf_cfg)
    cfg = LLMConfig(**{**cfg.__dict__, "dtype": "float32"})
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    exported = params_to_hf_state_dict(params, cfg)
    sd = {k: v for k, v in model.state_dict().items() if "rotary" not in k}
    for k, v in sd.items():
        np.testing.assert_allclose(
            exported[k], v.numpy(), rtol=1e-6, atol=1e-6, err_msg=k
        )


def test_eval_runner_greedy():
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.models.llm import LLMConfig, SamplingParams, init_params
    from rlinf_tpu.runners.eval_runner import evaluate_reasoning, print_eval_table

    cfg = LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, max_seq_len=128, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    data = PromptDataset([PromptExample(f"q{i}", "whatever") for i in range(5)])
    res = evaluate_reasoning(
        params, cfg, ByteTokenizer(), data,
        sampling=SamplingParams(max_new_tokens=4, greedy=True, eos_token_id=-1),
        reward_fn=lambda texts, answers: [1.0 if t else 0.0 for t in texts],
        batch_size=2,
    )
    assert res.num_examples == 5  # partial final batch handled
    assert res.accuracy == 1.0
    print_eval_table({"toy": res})


def test_agent_runner_step():
    from rlinf_tpu.agents import AgentLoopConfig, CalculatorTool, ToolRegistry
    from rlinf_tpu.config import AlgorithmConfig, RunnerConfig, TrainerConfig
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.models.llm import LLMConfig, SamplingParams
    from rlinf_tpu.runners.agent_runner import AgentRunner

    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=1,
            num_heads=2, num_kv_heads=2, max_seq_len=512, dtype="float32",
            qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(max_new_tokens=16, eos_token_id=-1),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=4),
        runner=RunnerConfig(rollout_batch_size=2, max_steps=1),
    )
    runner = AgentRunner(
        cfg, ByteTokenizer(),
        PromptDataset([PromptExample(f"q{i}", "7") for i in range(8)]),
        ToolRegistry([CalculatorTool()]),
        reward_fn=lambda texts, answers: [float(len(t) % 3 == 0) for t in texts],
        loop_cfg=AgentLoopConfig(max_turns=2, max_total_len=256),
    )
    out = runner.run_step()
    assert "agent/reward_mean" in out
    assert "agent/num_turns_mean" in out
    assert np.isfinite(out["actor/loss"])
