"""BM25 retrieval server + HTTP search tool (Search-R1 retrieval stack).

Reference analog: rlinf/agents/searchr1/search_tool_worker.py:66 — the
agent-side tool queries an external retrieval service over HTTP; here the
service is in-tree (agents/retrieval.py)."""

import json
from urllib.request import Request, urlopen

import jax
import pytest

from rlinf_tpu.agents.retrieval import (
    BM25Index,
    HTTPSearchTool,
    RetrievalServer,
)

CORPUS = {
    "paris": "Paris is the capital of France and sits on the Seine river.",
    "berlin": "Berlin is the capital of Germany, known for the Brandenburg "
              "Gate.",
    "tokyo": "Tokyo is the capital of Japan and the most populous city in "
             "the world.",
    "cheese": "Cheese is a dairy product made from milk, popular in France.",
}


def test_bm25_ranking():
    idx = BM25Index(CORPUS)
    hits = idx.search("capital of France", topk=2)
    assert hits[0][0] == "paris"
    assert hits[0][2] > hits[1][2]
    # query with no corpus overlap -> no hits
    assert idx.search("zzzqqq") == []


@pytest.fixture(scope="module")
def server():
    srv = RetrievalServer(CORPUS).start()
    yield srv
    srv.stop()


def test_retrieval_http_api(server):
    with urlopen(server.url + "/health", timeout=5) as r:
        health = json.loads(r.read())
    assert health == {"ok": True, "num_docs": 4}

    req = Request(
        server.url + "/retrieve",
        data=json.dumps({"query": "Brandenburg Gate", "topk": 1}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urlopen(req, timeout=5) as r:
        body = json.loads(r.read())
    assert body["ids"] == ["berlin"]
    assert "Germany" in body["documents"][0]


def test_http_search_tool_formatting(server):
    tool = HTTPSearchTool(server.url, topk=2)
    out = tool("capital of Japan")
    assert out.startswith("Doc 1: Tokyo")
    assert "Doc 2:" in out
    assert tool("zzzqqq") == "no results"


def test_searchr1_loop_over_http_retrieval(server):
    """The Search-R1 agent loop runs end-to-end against the real HTTP
    retrieval service (tool calls cross the process-boundary protocol)."""
    from rlinf_tpu.agents.recipes import SearchR1Recipe
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.engine import RolloutEngine

    cfg = LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=512, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    tok = ByteTokenizer()
    engine = RolloutEngine(
        cfg, SamplingParams(max_new_tokens=16, eos_token_id=-1),
        prompt_bucket=32,
    )
    recipe = SearchR1Recipe(max_turns=2, max_total_len=256)
    loop = recipe.make_loop(engine, tok, corpus={}, search_url=server.url)
    # force a search turn regardless of what the tiny model emits: call the
    # registered tool through the loop's registry (the loop path the parser
    # drives on real models)
    assert "search" in loop.tools
    obs = loop.tools.call("search", "capital of France")
    assert "Paris" in obs

    rollouts = loop.run(params, [tok.encode("who? ")], jax.random.PRNGKey(1))
    assert len(rollouts) == 1
    assert rollouts[0].num_turns >= 1
