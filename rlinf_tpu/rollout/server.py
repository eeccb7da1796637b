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
        import jax.numpy as jnp

        slots = [_Slot() for _ in range(eng.num_slots)]
        inflight: Dict[int, _Request] = {}       # slot -> request
        cache = M.init_kv_cache(eng.cfg, eng.num_slots, eng.max_seq_len)
        kv_valid = jnp.zeros((eng.num_slots, eng.max_seq_len), bool)
        write_pos = jnp.zeros((eng.num_slots,), jnp.int32)
        done = jnp.ones((eng.num_slots,), bool)
        cur_tokens = jnp.zeros((eng.num_slots,), jnp.int32)

        def bucket(n):
            b = eng.prompt_bucket
            return ((n + b - 1) // b) * b

        def req_budget(req: _Request) -> int:
            if req.max_new_tokens is None:
                return sp.max_new_tokens
            return min(req.max_new_tokens, sp.max_new_tokens)

        while not self._stop.is_set():
            with self._params_lock:
                params = self._params

            # 1. refill free slots from the queue
            refilled = False
            for s in range(eng.num_slots):
                if slots[s].request_idx >= 0:
                    continue
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                ids = req.prompt_ids[-(eng.max_seq_len - sp.max_new_tokens):]
                P_len = bucket(max(len(ids), 1))
                prompt = np.zeros((1, P_len), np.int32)
                mask = np.zeros((1, P_len), bool)
                prompt[0, : len(ids)] = ids
                mask[0, : len(ids)] = True
                cache, kv_valid, logits = eng._prefill(
                    params, cache, kv_valid, s,
                    jnp.asarray(prompt), jnp.asarray(mask))
                tok, lp = sample_from_logits(self._next_rng(), logits[None], sp)
                tok_i, lp_i = int(tok[0]), float(lp[0])
                slots[s] = _Slot(request_idx=s, prompt_len=len(ids),
                                 tokens=[tok_i], logprobs=[lp_i])
                inflight[s] = req
                write_pos = write_pos.at[s].set(len(ids))
                finished_now = (tok_i == sp.eos_token_id
                                or req_budget(req) <= 1)
                done = done.at[s].set(finished_now)
                cur_tokens = cur_tokens.at[s].set(tok_i)
                refilled = True

            active = [s for s in range(eng.num_slots)
                      if slots[s].request_idx >= 0]
            if not active:
                if not refilled:
                    self._stop.wait(self._idle_wait_s)
                continue

            # 2. chunked decode over the whole pool
            (cache, kv_valid, write_pos, done, cur_tokens,
             toks, lps, was_done) = eng._decode(
                params, cache, kv_valid, write_pos, done, cur_tokens,
                self._next_rng(), eng.decode_chunk)
            toks_np = np.asarray(toks)
            lps_np = np.asarray(lps)
            was_done_np = np.asarray(was_done)
            done_np = np.asarray(done)

            # 3. harvest finished slots; resolve futures
            for s in active:
                sl = slots[s]
                req = inflight[s]
                budget = req_budget(req)
                for k in range(eng.decode_chunk):
                    if was_done_np[k, s] or len(sl.tokens) >= budget:
                        break
                    sl.tokens.append(int(toks_np[k, s]))
                    sl.logprobs.append(float(lps_np[k, s]))
                finished = (bool(done_np[s]) or len(sl.tokens) >= budget
                            or sl.prompt_len + len(sl.tokens)
                            >= eng.max_seq_len)
                if finished:
                    tokens, lp_list = sl.tokens, sl.logprobs
                    if sp.eos_token_id in tokens:
                        cut = tokens.index(sp.eos_token_id) + 1
                        tokens, lp_list = tokens[:cut], lp_list[:cut]
                    req.future.set_result(
                        {"tokens": tokens[:budget],
                         "logprobs": lp_list[:budget]})
                    self.num_served += 1
                    slots[s] = _Slot()
                    del inflight[s]
                    done = done.at[s].set(True)
                    kv_valid = kv_valid.at[s].set(
                        jnp.zeros((eng.max_seq_len,), bool))
                    write_pos = write_pos.at[s].set(0)

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
