"""Server-mode rollout: continuous serving loop + OpenAI-style HTTP API.

Reference analog: rlinf/workers/rollout/sglang_server/{server_worker,
router_worker,launcher}.py + rollout/server/server_rollout_worker.py — SGLang
engines behind an HTTP router for online / agentic RL, where agent loops hit
an OpenAI-compatible endpoint instead of pushing batch RolloutRequests.

TPU design: one serving loop per chip wraps the continuous-batching engine's
jitted prefill/decode (rollout/continuous_engine.py) around a submit queue —
requests stream in at any time, finished slots free immediately, futures
resolve per-request. Weight sync while serving = swapping the param pytree
between decode chunks (the sync_hf_weight analog, sgl_scheduler.py:141 —
no bucket recv needed: params are already device-resident).

The HTTP layer is stdlib ThreadingHTTPServer (control plane only — tokens/s
is decided by the jitted decode loop, not the HTTP stack). ``RouterServer``
round-robins /v1/* calls across backend servers (router_worker.py analog).
"""

from __future__ import annotations

import json
import queue
import threading
import urllib.request
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.sampler import sample_from_logits
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine, _Slot


class _Request:
    __slots__ = ("prompt_ids", "max_new_tokens", "future")

    def __init__(self, prompt_ids: List[int], max_new_tokens: Optional[int]):
        self.prompt_ids = prompt_ids
        self.max_new_tokens = max_new_tokens
        self.future: Future = Future()


class GenerationServer:
    """Continuous serving loop over a ContinuousBatchingEngine.

    ``submit`` returns a Future resolving to {"tokens": [...], "logprobs":
    [...]}; ``update_params`` swaps weights between decode chunks (serving
    never stops — the async-RL weight sync semantics).
    """

    def __init__(self, engine: ContinuousBatchingEngine, params, *,
                 seed: int = 0, idle_wait_s: float = 0.01):
        self.engine = engine
        self._params = params
        self._params_lock = threading.Lock()
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._rng = jax.random.PRNGKey(seed)
        self._idle_wait_s = idle_wait_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.num_served = 0

    # -- public API --------------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._serve_loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=60)

    def submit(self, prompt_ids: Sequence[int],
               max_new_tokens: Optional[int] = None) -> Future:
        req = _Request(list(prompt_ids), max_new_tokens)
        self._queue.put(req)
        return req.future

    def generate(self, prompt_ids: Sequence[int],
                 max_new_tokens: Optional[int] = None,
                 timeout: Optional[float] = 300.0) -> Dict[str, List]:
        return self.submit(prompt_ids, max_new_tokens).result(timeout)

    def update_params(self, new_params):
        with self._params_lock:
            self._params = new_params

    # -- serving loop -------------------------------------------------------
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _serve_loop(self):
        eng = self.engine
        sp = eng.sampling

        pool = eng.init_pool()
        inflight: Dict[int, _Request] = {}       # key -> request
        next_key = 0
        cached_params = None
        prepared = None

        def req_budget(req: _Request) -> int:
            if req.max_new_tokens is None:
                return sp.max_new_tokens
            return min(req.max_new_tokens, sp.max_new_tokens)

        while not self._stop.is_set():
            with self._params_lock:
                params = self._params
            if params is not cached_params:
                # weight swap between decode chunks (sync_hf_weight analog):
                # re-quantize decode params once per new pytree
                prepared = eng.prepare_params(params)
                cached_params = params
            pparams, dparams = prepared

            # 1. refill free slots from the queue (batched prefill)
            n_free = sum(
                1 for s in pool.slots if s.request_idx < 0
            )
            entries = []
            while len(entries) < n_free:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                inflight[next_key] = req
                entries.append((next_key, req.prompt_ids, req_budget(req)))
                next_key += 1
            if entries:
                eng.refill(pool, pparams, entries, self._next_rng())

            if pool.num_active == 0:
                if not entries:
                    self._stop.wait(self._idle_wait_s)
                continue

            # 2. chunked decode + harvest; resolve futures
            for fin in eng.decode_and_harvest(pool, dparams, self._next_rng()):
                req = inflight.pop(fin.request_idx)
                req.future.set_result(
                    {"tokens": fin.tokens, "logprobs": fin.logprobs}
                )
                self.num_served += 1

        # drain: fail any outstanding futures on stop
        for req in list(inflight.values()):
            if not req.future.done():
                req.future.set_exception(RuntimeError("server stopped"))
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(RuntimeError("server stopped"))


# ---------------------------------------------------------------------------
# OpenAI-style HTTP layer
# ---------------------------------------------------------------------------


def _render_chat(messages: List[Dict[str, Any]]) -> str:
    """Minimal chat template (role-tagged turns + assistant cue)."""
    parts = [f"<|{m.get('role', 'user')}|>{m.get('content', '')}"
             for m in messages]
    return "".join(parts) + "<|assistant|>"


class OpenAIHTTPServer:
    """OpenAI-compatible /v1/completions + /v1/chat/completions over a
    GenerationServer (reference sglang_server/server_worker.py analog)."""

    def __init__(self, gen_server: GenerationServer, tokenizer, *,
                 host: str = "127.0.0.1", port: int = 0):
        self.gen_server = gen_server
        self.tokenizer = tokenizer
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):     # silence request logging
                pass

            def _json(self, code: int, body: Dict[str, Any]):
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok",
                                     "served": outer.gen_server.num_served})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    self._json(400, {"error": "bad json"})
                    return
                try:
                    if self.path == "/v1/completions":
                        self._json(200, outer._completions(body))
                    elif self.path == "/v1/chat/completions":
                        self._json(200, outer._chat(body))
                    else:
                        self._json(404, {"error": "not found"})
                except Exception as e:   # noqa: BLE001 — surface to client
                    self._json(500, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=10)

    def _generate_text(self, prompt: str, max_tokens: Optional[int]):
        ids = self.tokenizer.encode(prompt)
        out = self.gen_server.generate(ids, max_new_tokens=max_tokens)
        text = self.tokenizer.decode(out["tokens"])
        return text, len(ids), len(out["tokens"])

    def _completions(self, body: Dict[str, Any]) -> Dict[str, Any]:
        text, n_in, n_out = self._generate_text(
            body.get("prompt", ""), body.get("max_tokens"))
        return {
            "object": "text_completion",
            "choices": [{"index": 0, "text": text,
                         "finish_reason": "stop"}],
            "usage": {"prompt_tokens": n_in, "completion_tokens": n_out,
                      "total_tokens": n_in + n_out},
        }

    def _chat(self, body: Dict[str, Any]) -> Dict[str, Any]:
        prompt = _render_chat(body.get("messages", []))
        text, n_in, n_out = self._generate_text(
            prompt, body.get("max_tokens"))
        return {
            "object": "chat.completion",
            "choices": [{"index": 0,
                         "message": {"role": "assistant", "content": text},
                         "finish_reason": "stop"}],
            "usage": {"prompt_tokens": n_in, "completion_tokens": n_out,
                      "total_tokens": n_in + n_out},
        }


class RouterServer:
    """HTTP round-robin router over backend OpenAI servers (reference
    rollout/sglang_server/router_worker.py)."""

    def __init__(self, backend_urls: List[str], *, host: str = "127.0.0.1",
                 port: int = 0, timeout: float = 300.0):
        self.backends = list(backend_urls)
        self.timeout = timeout
        self._i = 0
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path == "/health":
                    data = json.dumps(
                        {"status": "ok",
                         "backends": len(outer.backends)}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(length)
                backend = outer._next_backend()
                req = urllib.request.Request(
                    backend + self.path, data=payload,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(
                            req, timeout=outer.timeout) as r:
                        data = r.read()
                        self.send_response(r.status)
                except Exception as e:   # noqa: BLE001
                    data = json.dumps({"error": str(e)}).encode()
                    self.send_response(502)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def _next_backend(self) -> str:
        with self._lock:
            url = self.backends[self._i % len(self.backends)]
            self._i += 1
        return url

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=10)
