"""Tokenizer protocol + adapters (reference: rlinf/data/tokenizers.py).

Any object with ``encode(str) -> List[int]`` and ``decode(List[int]) -> str``
works. ``HFTokenizer`` wraps a local transformers tokenizer; ``ByteTokenizer``
is a dependency-free fallback for tests and toy tasks.
"""

from __future__ import annotations

from typing import List, Optional, Protocol


class Tokenizer(Protocol):
    def encode(self, text: str) -> List[int]: ...
    def decode(self, ids: List[int]) -> str: ...


class ByteTokenizer:
    """UTF-8 bytes + 2 specials. vocab: 0=pad, 1=eos, bytes shifted by 2."""

    vocab_size = 258
    pad_id = 0
    eos_id = 1

    def encode(self, text: str) -> List[int]:
        return [b + 2 for b in text.encode("utf-8")]

    def decode(self, ids: List[int]) -> str:
        return bytes(
            i - 2 for i in ids if 2 <= i < 258  # ids past the byte range
        ).decode("utf-8", errors="replace")  # (vocab padding) are skipped


class HFTokenizer:
    def __init__(self, name_or_path: str):
        from transformers import AutoTokenizer

        self.tk = AutoTokenizer.from_pretrained(name_or_path)
        self.pad_id = self.tk.pad_token_id or self.tk.eos_token_id
        self.eos_id = self.tk.eos_token_id
        self.vocab_size = len(self.tk)

    def encode(self, text: str) -> List[int]:
        return self.tk.encode(text, add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self.tk.decode(ids, skip_special_tokens=False)

    def apply_chat_template(self, messages, add_generation_prompt=True) -> List[int]:
        return self.tk.apply_chat_template(
            messages, add_generation_prompt=add_generation_prompt, tokenize=True
        )
