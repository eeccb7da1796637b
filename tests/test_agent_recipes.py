"""Agent recipes: Search-R1, rStar2 (python tool sessions), WideSeek-R1
multi-role team, external-agent adapter (reference rlinf/agents/*)."""

import jax
import pytest

from rlinf_tpu.agents.recipes import (
    ExternalAgentAdapter,
    PythonSessionTool,
    RStar2Recipe,
    SearchR1Recipe,
    WideSeekR1Recipe,
)
from rlinf_tpu.agents.agent_loop import AgentRollout, build_agent_train_batch
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm import LLMConfig, SamplingParams, init_params
from rlinf_tpu.rollout.engine import RolloutEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=512, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    engine = RolloutEngine(
        cfg, SamplingParams(max_new_tokens=16, eos_token_id=-1, pad_token_id=0)
    )
    return engine, params, ByteTokenizer()


def test_python_session_tool_state_carries_over():
    tool = PythonSessionTool()
    assert tool("x = 21", session=0) == "(no output)"
    assert tool("print(x * 2)", session=0) == "42"
    # sessions are isolated
    out = tool("print(x)", session=1)
    assert out.startswith("error:")
    # failed snippets don't poison the session
    assert tool("print(x + 1)", session=0) == "22"
    # only NEW stdout is returned on later calls
    tool("print('a')", session=2)
    assert tool("print('b')", session=2) == "b"


def test_python_session_tool_timeout():
    tool = PythonSessionTool(timeout_s=0.5)
    assert "timed out" in tool("while True: pass", session=0)


def test_searchr1_recipe_end_to_end(tiny):
    engine, params, tok = tiny
    recipe = SearchR1Recipe(max_turns=2, max_total_len=256)
    loop = recipe.make_loop(
        engine, tok, {"france": "Paris is the capital of France."}
    )
    prompts = [tok.encode("Q: capital of France?\n")] * 2
    rollouts = loop.run(params, prompts, jax.random.PRNGKey(0))
    assert len(rollouts) == 2 and all(r.num_turns >= 1 for r in rollouts)
    # reward wiring: perfect answer scores 1, garbage scores 0
    good = AgentRollout([], [], [], final_text="<answer>Paris</answer>")
    assert recipe.reward(good, "Paris") == 1.0
    assert recipe.reward(rollouts[0], "#@!impossible!@#") == 0.0
    # rollouts assemble into a train batch
    rewards = recipe.batch_rewards(rollouts, ["Paris", "Paris"])
    batch = build_agent_train_batch(rollouts, rewards, pad_id=0)
    assert batch.input_ids.shape[0] == 2


def test_rstar2_recipe_tool_and_scorer(tiny):
    engine, params, tok = tiny
    recipe = RStar2Recipe(max_turns=2, max_total_len=256)
    loop = recipe.make_loop(engine, tok)
    rollouts = loop.run(params, [tok.encode("Compute 6*7.\n")], jax.random.PRNGKey(1))
    assert len(rollouts) == 1
    good = AgentRollout([], [], [], final_text="The answer is \\boxed{42}")
    assert recipe.reward(good, "42") == 1.0
    bad = AgentRollout(
        [], [], [],
        final_text="<result>error: boom</result> \\boxed{42}",
    )
    assert recipe.reward(bad, "42") == pytest.approx(0.9)


def test_wideseek_team(tiny):
    engine, params, tok = tiny
    recipe = WideSeekR1Recipe(num_searchers=2, max_total_len=256)
    team = recipe.run_team(
        engine, tok, params, ["capital of France?"],
        {"france": "Paris"}, jax.random.PRNGKey(2),
    )
    assert len(team["planner"]) == 1
    assert len(team["searcher"]) == 2
    assert len(team["summarizer"]) == 1
    rewards = recipe.team_rewards(team, ["Paris"])
    assert len(rewards["searcher"]) == 2
    # cooperative credit: every role sees the same terminal score
    assert rewards["planner"][0] == rewards["summarizer"][0]
    # a hand-built perfect summarizer scores 1 for everyone
    team["summarizer"] = [
        AgentRollout([], [], [], final_text="<answer>Paris</answer>")
    ]
    rewards = recipe.team_rewards(team, ["Paris"])
    assert rewards["planner"] == [1.0] and set(rewards["searcher"]) == {1.0}


def test_external_agent_adapter(tiny):
    """A user-written agent loop (plain Python) becomes a trainable rollout."""
    engine, params, tok = tiny
    adapter = ExternalAgentAdapter(engine, tok, params, jax.random.PRNGKey(3))

    def my_agent(complete):
        a = complete("step one: ")
        b = complete("step two given " + a[:10] + ": ")
        return a + b

    final = my_agent(adapter.complete)
    rollout = adapter.finish(final)
    assert rollout.num_turns == 2 and len(rollout.turn_spans) == 2
    assert sum(rollout.loss_mask) > 0  # model tokens trainable
    assert not all(rollout.loss_mask)  # scaffolding masked off
    # model-token count matches span widths
    span_tokens = sum(e - s for s, e in rollout.turn_spans)
    assert span_tokens == sum(rollout.loss_mask)
    batch = build_agent_train_batch([rollout], [1.0], pad_id=0)
    assert batch.input_ids.shape[0] == 1


def test_team_batch_one_batch_all_roles(tiny):
    """Multi-agent tree training (VERDICT r4 item 9): every role of every
    team episode lands in ONE TrainBatch with per-turn loss masks and
    group-normalized team advantages (reference MultiAgentLoopWorker,
    rlinf/workers/agent/agent_loop.py:432)."""
    import numpy as np

    engine, params, tokenizer = tiny
    recipe = WideSeekR1Recipe(num_searchers=2, max_total_len=256)
    questions = ["q alpha", "q alpha"]  # 1 question x group_size 2
    corpus = {"alpha": "alpha is answer-a"}
    team = recipe.run_team(engine, tokenizer, params, questions, corpus,
                           jax.random.PRNGKey(3))
    batch, roles, metrics = recipe.build_team_batch(
        team, ["answer-a", "answer-a"], group_size=2, pad_id=0)
    # rows: 2 planners + 4 searchers + 2 summarizers
    assert len(roles) == 8
    assert roles.count("planner") == 2 and roles.count("searcher") == 4
    d = batch.to_dict()
    assert d["input_ids"].shape[0] == 8
    # every row with any loss tokens carries a single advantage value
    lm = d["loss_mask"]
    adv = d["advantages"]
    for i in range(8):
        vals = set(np.round(adv[i][lm[i]], 6).tolist())
        assert len(vals) <= 1
    assert metrics["agent/rows"] == 8.0


def test_mask_failed_turns():
    from rlinf_tpu.agents.recipes import mask_failed_turns

    r = AgentRollout(
        token_ids=list(range(10)),
        loss_mask=[False] * 2 + [True] * 8,
        logprobs=[0.0] * 10,
        num_turns=2,
        turn_spans=[(2, 5), (7, 10)],
        turn_errors=[True, False],
    )
    out = mask_failed_turns(r)
    assert out.loss_mask[2:5] == [False] * 3      # failed turn masked
    assert out.loss_mask[7:10] == [True] * 3      # good turn kept
    assert r.loss_mask[2:5] == [True] * 3         # original untouched
