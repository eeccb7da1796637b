"""In-process byte-level BPE (data/tokenizers.BPETokenizer)."""

import numpy as np

from rlinf_tpu.data.tokenizers import BPETokenizer


CORPUS = [
    "Tom has 23 apples. Tom buys 4 bags of 5 apples each.",
    "Mia finds 17 more coins. How many coins does Mia have now?",
    "12 + 34 = 46. 46 * 2 = 92.\n#### 92",
] * 50


def test_round_trip_exact():
    tok = BPETokenizer.train(CORPUS, num_merges=100)
    for s in CORPUS[:3] + ["unseen text 999 + 111", "émoji ✓ bytes"]:
        assert tok.decode(tok.encode(s)) == s


def test_digit_atomic_by_default():
    tok = BPETokenizer.train(CORPUS, num_merges=200)
    ids = tok.encode("12345")
    # every digit is its own byte token (no merged token contains a digit)
    assert len(ids) == 5
    for i, (a, b) in enumerate(tok.merges):
        assert not any(ch.isdigit() for ch in tok._bytes[258 + i].decode(
            "utf-8", errors="ignore"))


def test_compression_and_vocab():
    tok = BPETokenizer.train(CORPUS, num_merges=200)
    assert 258 < tok.vocab_size <= 458
    s = CORPUS[0]
    assert len(tok.encode(s)) < len(s)  # merges actually compress


def test_save_load(tmp_path):
    tok = BPETokenizer.train(CORPUS, num_merges=64)
    p = tmp_path / "tok.json"
    tok.save(str(p))
    tok2 = BPETokenizer.load(str(p))
    s = "Tom has 23 apples."
    assert tok.encode(s) == tok2.encode(s)
    assert tok2.vocab_size == tok.vocab_size


def test_specials():
    tok = BPETokenizer.train(CORPUS, num_merges=16)
    assert tok.pad_id == 0 and tok.eos_id == 1
    # decode skips non-byte specials
    assert tok.decode([0, 1] + tok.encode("hi")) == "hi"
