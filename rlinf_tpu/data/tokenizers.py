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


class BPETokenizer:
    """Byte-level BPE trained in-process (reference analog: the HF fast
    tokenizers the reference loads per model, rlinf/data/tokenizers.py —
    this image has no pretrained tokenizer files, so the proof pipeline
    trains its own merges on the task corpus).

    vocab layout: 0=pad, 1=eos, 2..257=bytes, 258.. = merged pairs (by
    rank). ``train`` runs classic BPE on a corpus sample; ``encode`` applies
    merges in rank order (exact BPE segmentation).
    """

    pad_id = 0
    eos_id = 1
    _BYTE0 = 2

    def __init__(self, merges: Optional[List[tuple]] = None):
        self.merges: List[tuple] = list(merges or [])
        self._rebuild()

    def _rebuild(self):
        self.vocab_size = 258 + len(self.merges)
        self._rank = {pair: 258 + i for i, pair in enumerate(self.merges)}
        # decode table: id -> bytes
        self._bytes = {i: bytes([i - self._BYTE0]) for i in range(2, 258)}
        for i, (a, b) in enumerate(self.merges):
            self._bytes[258 + i] = self._bytes[a] + self._bytes[b]

    @classmethod
    def train(cls, texts: List[str], num_merges: int = 512,
              sample_chars: int = 200_000,
              merge_digits: bool = False) -> "BPETokenizer":
        """Greedy most-frequent-pair merges over a corpus sample.

        ``merge_digits=False`` (default) never merges tokens containing
        digit bytes — numbers stay digit-atomic, which both lengthens
        math responses and makes digit arithmetic learnable (each digit is
        its own embedding, the convention math-LLM tokenizers converged on).
        """
        corpus: List[List[int]] = []
        total = 0
        for t in texts:
            ids = [b + cls._BYTE0 for b in t.encode("utf-8")]
            corpus.append(ids)
            total += len(ids)
            if total >= sample_chars:
                break
        tok = cls()
        from collections import Counter

        digit_bytes = set(range(ord("0") + cls._BYTE0,
                                ord("9") + 1 + cls._BYTE0))

        def has_digit(i: int) -> bool:
            return i in digit_bytes  # merged ids never contain digits

        for _ in range(num_merges):
            counts: Counter = Counter()
            for seq in corpus:
                counts.update(zip(seq, seq[1:]))
            if not merge_digits:
                counts = Counter({
                    p: c for p, c in counts.items()
                    if not (has_digit(p[0]) or has_digit(p[1]))
                })
            if not counts:
                break
            pair, freq = counts.most_common(1)[0]
            if freq < 4:
                break
            new_id = 258 + len(tok.merges)
            tok.merges.append(pair)
            a, b = pair
            merged_corpus = []
            for seq in corpus:
                out, i, n = [], 0, len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                        out.append(new_id)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                merged_corpus.append(out)
            corpus = merged_corpus
        tok._rebuild()
        return tok

    def encode(self, text: str) -> List[int]:
        seq = [b + self._BYTE0 for b in text.encode("utf-8")]
        while len(seq) > 1:
            # lowest-rank (earliest-learned) applicable pair first
            best, best_rank = None, None
            for pair in zip(seq, seq[1:]):
                r = self._rank.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = pair, r
            if best is None:
                break
            a, b = best
            new_id = best_rank
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    def decode(self, ids: List[int]) -> str:
        out = b"".join(
            self._bytes.get(i, b"") for i in ids if i >= self._BYTE0
        )
        return out.decode("utf-8", errors="replace")

    # persistence (proof runs save the trained merges next to the params)
    def save(self, path: str):
        import json as _json

        with open(path, "w") as f:
            _json.dump({"merges": self.merges}, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        import json as _json

        with open(path) as f:
            data = _json.load(f)
        return cls(merges=[tuple(m) for m in data["merges"]])
