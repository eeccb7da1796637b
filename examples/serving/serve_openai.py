"""Serve a model behind an OpenAI-compatible endpoint with continuous
batching (server-mode rollout for online/agentic RL).

Run: python examples/serving/serve_openai.py [--model /path/to/hf/checkpoint]
then: curl localhost:8000/v1/completions -d '{"prompt": "hi", "max_tokens": 16}'
"""

import argparse
import time

import jax

from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm import LLMConfig, SamplingParams, init_params
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine
from rlinf_tpu.rollout.server import GenerationServer, OpenAIHTTPServer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="local HF checkpoint dir")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    args = ap.parse_args()

    if args.model:
        from rlinf_tpu.models.llm.hf_import import load_hf_pretrained
        from transformers import AutoTokenizer

        cfg, params = load_hf_pretrained(args.model)
        tokenizer = AutoTokenizer.from_pretrained(args.model)
    else:  # demo: random tiny model + byte tokenizer
        cfg = LLMConfig.tiny(vocab_size=300, max_seq_len=512)
        params = init_params(cfg, jax.random.PRNGKey(0))
        tokenizer = ByteTokenizer()

    sp = SamplingParams(max_new_tokens=args.max_new_tokens,
                        eos_token_id=getattr(tokenizer, "eos_token_id", -1) or -1)
    engine = ContinuousBatchingEngine(cfg, sp, num_slots=32)
    server = GenerationServer(engine, params)
    server.start()
    http = OpenAIHTTPServer(server, tokenizer, port=args.port)
    http.start()
    print(f"serving on {http.url} (/v1/completions, /v1/chat/completions, /health)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        http.stop()
        server.stop()


if __name__ == "__main__":
    main()
