"""Server-mode rollout: serving loop, OpenAI HTTP API, router, API reward.

Reference analog: the sglang_server worker/router stack
(rlinf/workers/rollout/sglang_server/) and api_reward_worker.py, tested
end-to-end over localhost HTTP like the reference's server e2e configs.
"""

import json
import urllib.request

import jax
import numpy as np
import pytest

from rlinf_tpu.algorithms.rewards.api_reward import (
    APIRewardClient,
    default_score_parser,
)
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm import LLMConfig, SamplingParams, generate, init_params
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine
from rlinf_tpu.rollout.server import (
    GenerationServer,
    OpenAIHTTPServer,
    RouterServer,
)


@pytest.fixture(scope="module")
def setup():
    cfg = LLMConfig(
        vocab_size=300, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=256, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    sp = SamplingParams(max_new_tokens=8, greedy=True, eos_token_id=-1,
                        pad_token_id=0)
    engine = ContinuousBatchingEngine(
        cfg, sp, num_slots=3, max_seq_len=64, prompt_bucket=16,
        decode_chunk=4)
    server = GenerationServer(engine, params, seed=0)
    server.start()
    yield cfg, params, sp, server
    server.stop()


def _static_greedy(cfg, params, prompt, sp):
    import jax.numpy as jnp

    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones((1, len(prompt)), bool)
    out = generate(params, cfg, jax.random.PRNGKey(0), ids, mask, sp)
    n = int(out.response_lengths[0])
    return list(np.asarray(out.response_ids)[0, :n])


def test_generation_server_matches_static(setup):
    cfg, params, sp, server = setup
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 300, size=rng.integers(3, 15)))
               for _ in range(7)]
    futures = [server.submit(p) for p in prompts]
    for p, f in zip(prompts, futures):
        got = f.result(timeout=300)["tokens"]
        assert got == _static_greedy(cfg, params, p, sp)


def test_generation_server_per_request_budget(setup):
    _, _, _, server = setup
    out = server.generate([5, 6, 7], max_new_tokens=3)
    assert len(out["tokens"]) == 3


def test_generation_server_weight_update_while_serving(setup):
    cfg, params, sp, server = setup
    new_params = jax.tree_util.tree_map(lambda x: x * 1.5, params)
    server.update_params(new_params)
    try:
        got = server.generate([9, 8, 7, 6])["tokens"]
        assert got == _static_greedy(cfg, new_params, [9, 8, 7, 6], sp)
    finally:
        server.update_params(params)


def test_openai_http_and_router(setup):
    _, _, _, server = setup
    tok = ByteTokenizer()
    http = OpenAIHTTPServer(server, tok)
    http.start()
    router = RouterServer([http.url])
    router.start()
    try:
        # completions via router
        body = json.dumps({"prompt": "hi", "max_tokens": 4}).encode()
        req = urllib.request.Request(
            router.url + "/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["usage"]["completion_tokens"] == 4
        assert isinstance(out["choices"][0]["text"], str)

        # chat via router
        body = json.dumps({"messages": [{"role": "user", "content": "yo"}],
                           "max_tokens": 2}).encode()
        req = urllib.request.Request(
            router.url + "/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["message"]["role"] == "assistant"

        # health endpoints
        with urllib.request.urlopen(router.url + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(http.url + "/health", timeout=30) as r:
            assert json.loads(r.read())["served"] >= 2
    finally:
        router.stop()
        http.stop()


# ---------------------------------------------------------------------------
# API reward client (against a stub judge endpoint)
# ---------------------------------------------------------------------------


def test_api_reward_client():
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    class Judge(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            text = body["messages"][-1]["content"]
            score = 1.0 if "good" in text else 0.0
            resp = json.dumps({"choices": [{"message": {
                "role": "assistant",
                "content": f"Verdict. Score: {score}"}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Judge)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        client = APIRewardClient(f"http://127.0.0.1:{httpd.server_address[1]}")
        payloads = [
            [{"role": "user", "content": "this is good"}],
            [{"role": "user", "content": "this is bad"}],
            [{"role": "user", "content": "also good stuff"}],
        ]
        assert client.score_batch(payloads) == [1.0, 0.0, 1.0]
    finally:
        httpd.shutdown()

    assert default_score_parser("on a 0-1 scale: 0.75") == 0.75
    assert default_score_parser("no numbers") == 0.0
