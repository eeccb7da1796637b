"""Agentic multi-turn loop: parsers, tools, loss-mask assembly, e2e mechanics."""

import numpy as np
import jax
import pytest

from rlinf_tpu.agents import (
    AgentLoop,
    AgentLoopConfig,
    CalculatorTool,
    EchoTool,
    ToolRegistry,
)
from rlinf_tpu.agents.agent_loop import build_agent_train_batch
from rlinf_tpu.agents.tools import DictSearchTool
from rlinf_tpu.algorithms.toolcall_parsers import get_toolcall_parser
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm import LLMConfig, SamplingParams, init_params
from rlinf_tpu.rollout.engine import RolloutEngine
from rlinf_tpu.training.learner import PolicyLossConfig, make_policy_train_step
from rlinf_tpu.training.train_state import (
    OptimizerConfig, create_train_state, make_optimizer,
)


def test_tag_parser():
    parse = get_toolcall_parser("tag")
    call = parse("thinking... <tool=calc>2+3*4</tool> trailing junk")
    assert call.tool == "calc" and call.args == "2+3*4"
    assert parse("no tools here") is None


def test_search_tags_parser():
    parse = get_toolcall_parser("search_tags")
    call = parse("I should look up <search>capital of France</search>")
    assert call.tool == "search" and call.args == "capital of France"


def test_json_parser():
    parse = get_toolcall_parser("json")
    call = parse('<tool_call>{"name": "calc", "arguments": {"x": 1}}</tool_call>')
    assert call.tool == "calc"
    assert parse("<tool_call>not json</tool_call>") is None


def test_calculator_tool_safe():
    calc = CalculatorTool()
    assert calc("2+3*4") == "14"
    assert calc("(1+2)**2 / 3") == "3"
    reg = ToolRegistry([calc])
    assert "error" in reg.call("calc", "__import__('os')")
    assert "unknown tool" in reg.call("nope", "x")


def test_dict_search_tool():
    tool = DictSearchTool({"france": "Paris is the capital of France."})
    assert "Paris" in tool("capital of france")
    assert tool("zanzibar") == "no results found"


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=512, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    engine = RolloutEngine(
        cfg, SamplingParams(max_new_tokens=24, eos_token_id=-1, pad_token_id=0),
        prompt_bucket=32,
    )
    return cfg, params, engine


class ForcedToolTokenizer(ByteTokenizer):
    """Decodes normally, but the test monkeypatches generation content by
    relying on random bytes — instead we verify mechanics with a scripted
    parse by inserting tool tags via the template."""


def test_agent_loop_mechanics(tiny_engine):
    cfg, params, engine = tiny_engine
    tk = ByteTokenizer()
    tools = ToolRegistry([EchoTool(), CalculatorTool()])
    loop = AgentLoop(engine, tk, tools, AgentLoopConfig(max_turns=2, max_total_len=256))
    prompts = [tk.encode(f"question {i}: ") for i in range(4)]
    rollouts = loop.run(params, prompts, jax.random.PRNGKey(0))

    assert len(rollouts) == 4
    for i, r in enumerate(rollouts):
        # prompt is masked out of the loss
        assert not any(r.loss_mask[: r.prompt_len])
        assert r.prompt_len == len(prompts[i])
        assert 1 <= r.num_turns <= 2
        assert len(r.token_ids) == len(r.loss_mask) == len(r.logprobs)
        # random bytes essentially never form a valid tool tag
        assert sum(r.loss_mask) > 0

    # assemble a train batch and run one PPO step end-to-end
    adv = np.asarray([1.0, -1.0, 0.5, -0.5], np.float32)
    batch = build_agent_train_batch(rollouts, adv, pad_id=0, seq_bucket=64)
    assert batch.input_ids.shape[1] % 64 == 0
    # env/prompt tokens carry no advantage
    assert np.all(batch.advantages[~batch.loss_mask] == 0)

    tx = make_optimizer(OptimizerConfig(lr=1e-4))
    state = create_train_state(lambda r: init_params(cfg, r), tx, jax.random.PRNGKey(1))
    step = make_policy_train_step(cfg, PolicyLossConfig(), tx)
    import jax.numpy as jnp

    state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.to_dict().items()})
    assert np.isfinite(float(metrics["actor/loss"]))


def test_agent_loop_executes_tool_and_masks_result(tiny_engine):
    """Force a tool call by making the 'model' output a tag via a scripted
    tokenizer wrapper: we inject the call text into round-1 output by using a
    1-token generation and a custom parse on the decoded text."""
    cfg, params, engine = tiny_engine
    tk = ByteTokenizer()

    calls = []

    class SpyCalc(CalculatorTool):
        def __call__(self, args):
            calls.append(args)
            return super().__call__(args)

    tools = ToolRegistry([SpyCalc()])
    loop = AgentLoop(
        engine, tk, tools, AgentLoopConfig(max_turns=2, max_total_len=400)
    )

    # monkeypatch the parser to fire on ANY text, simulating a model that
    # always calls calc(1+1) — mechanics of append/mask are what we verify
    from rlinf_tpu.algorithms.toolcall_parsers import ToolCall

    loop.parse = lambda text: ToolCall(
        tool="calc", args="1+1", raw=text[:4], end_pos=min(4, len(text))
    )
    prompts = [tk.encode("go:")]
    rollouts = loop.run(params, prompts, jax.random.PRNGKey(0))
    r = rollouts[0]
    assert calls == ["1+1"]  # second turn is final (max_turns), no 2nd call
    # the tool result "<result>2</result>" appears in the conversation,
    # and its tokens are loss-masked False
    text = tk.decode(r.token_ids)
    assert "<result>2</result>" in text
    # exactly the injected observation tokens are loss-masked off (beyond the
    # prompt), and they carry zero behavior logprob
    obs_len = len(tk.encode("\n<result>2</result>\n"))
    masked_off = [
        i for i in range(r.prompt_len, len(r.token_ids)) if not r.loss_mask[i]
    ]
    assert len(masked_off) == obs_len
    # the masked-off span is contiguous and decodes to the observation
    assert masked_off == list(range(masked_off[0], masked_off[0] + obs_len))
    span_text = tk.decode([r.token_ids[i] for i in masked_off])
    assert span_text == "\n<result>2</result>\n"
    assert all(r.logprobs[i] == 0.0 for i in masked_off)


def test_turn_level_train_batch(tiny_engine):
    """Per-turn grpo_dynamic advantages land on each turn's tokens (the
    MultiAgentLoopWorker analog, reference agent_loop.py:432)."""
    from rlinf_tpu.agents.agent_loop import build_turn_level_train_batch

    cfg, params, engine = tiny_engine
    tk = ByteTokenizer()
    tools = ToolRegistry([EchoTool()])
    loop = AgentLoop(engine, tk, tools,
                     AgentLoopConfig(max_turns=2, max_total_len=256))
    # group_size=2: rollouts 0,1 share question A; 2,3 share question B
    prompts = [tk.encode("qA: "), tk.encode("qA: "),
               tk.encode("qB: "), tk.encode("qB: ")]
    rollouts = loop.run(params, prompts, jax.random.PRNGKey(0))
    for r in rollouts:
        assert len(r.turn_spans) == r.num_turns
        for (s, e) in r.turn_spans:
            assert all(r.loss_mask[s:e])

    turn_rewards = [[float(i + k) for k in range(r.num_turns)]
                    for i, r in enumerate(rollouts)]
    batch = build_turn_level_train_batch(
        rollouts, turn_rewards, group_size=2, pad_id=0)
    # env/prompt tokens never carry advantage
    assert np.all(batch.advantages[~batch.loss_mask] == 0)
    # within one rollout, different turns get different advantages when their
    # rewards differ (per-turn normalization, not per-sequence broadcast)
    multi = [i for i, r in enumerate(rollouts) if r.num_turns >= 2]
    if multi:
        i = multi[0]
        r = rollouts[i]
        (s0, e0), (s1, e1) = r.turn_spans[0], r.turn_spans[1]
        a0 = batch.advantages[i, s0:e0 - 1][batch.loss_mask[i, s0:e0 - 1]]
        a1 = batch.advantages[i, s1:e1 - 1][batch.loss_mask[i, s1:e1 - 1]]
        if a0.size and a1.size:
            assert not np.isclose(a0[0], a1[0])
    # advantages are group-normalized: overall mean over turns ~ 0
    vals = batch.advantages[batch.loss_mask]
    assert np.isfinite(vals).all()
