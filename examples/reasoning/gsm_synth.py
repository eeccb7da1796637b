"""Synthetic multi-step GSM8K-style corpus (chain-of-thought + '#### N').

The nearest no-egress analog of BASELINE config 1's GSM8K data
(reference examples/reasoning/main_grpo.py + config/math): templated
multi-step word problems whose chain-of-thought solutions and final-answer
format ('#### N') match the GSM8K convention the math verifier ladder
extracts (rlinf_tpu/algorithms/rewards/math_verifier.py:extract_answer).

Each problem is a 2-4 step arithmetic chain over a running quantity —
small operands so a from-scratch ~30M model can learn the digit algorithms
from SFT, with enough headroom that RL improves verified accuracy.
"""

from __future__ import annotations

import random
from typing import List, Tuple

NAMES = ["Tom", "Mia", "Sam", "Ava", "Leo", "Zoe", "Max", "Ida"]
ITEMS = ["apples", "coins", "books", "pens", "cards", "shells", "stamps"]


def make_problem(rng: random.Random, min_steps=3, max_steps=6) -> Tuple[str, str, str]:
    """-> (question, chain_of_thought_answer, final_answer_str).

    Hard enough that a partially-SFT'd ~30M model is imperfect (2-digit
    operands, 3-6 chained steps, occasional distractor sentence about
    ANOTHER person that must be ignored) — the RL-headroom requirement."""
    name = rng.choice(NAMES)
    item = rng.choice(ITEMS)
    v = rng.randint(5, 45)
    story = [f"{name} has {v} {item}."]
    cot = []
    steps = rng.randint(min_steps, max_steps)
    for _ in range(steps):
        if rng.random() < 0.25:  # distractor: someone else's count
            other = rng.choice([n for n in NAMES if n != name])
            story.append(
                f"{other} has {rng.randint(2, 60)} {item} too."
            )
        kind = rng.randrange(5)
        if kind == 0:
            k, m = rng.randint(2, 7), rng.randint(2, 9)
            story.append(f"{name} buys {k} bags of {m} {item} each.")
            nv = v + k * m
            cot.append(f"{k} * {m} = {k * m}. {v} + {k * m} = {nv}.")
        elif kind == 1 and v > 3:
            d = rng.randint(1, v - 1)
            story.append(f"{name} gives away {d} {item}.")
            nv = v - d
            cot.append(f"{v} - {d} = {nv}.")
        elif kind == 2:
            d = rng.randint(3, 28)
            story.append(f"{name} finds {d} more {item}.")
            nv = v + d
            cot.append(f"{v} + {d} = {nv}.")
        elif kind == 3 and v <= 70:
            story.append(f"A friend doubles {name}'s {item}.")
            nv = v * 2
            cot.append(f"{v} * 2 = {nv}.")
        elif v % 2 == 0 and v >= 4:
            story.append(f"{name} loses half of the {item}.")
            nv = v // 2
            cot.append(f"{v} / 2 = {nv}.")
        else:
            d = rng.randint(3, 28)
            story.append(f"{name} finds {d} more {item}.")
            nv = v + d
            cot.append(f"{v} + {d} = {nv}.")
        v = nv
    question = " ".join(story) + f" How many {item} does {name} have now?"
    answer = " ".join(cot) + f"\n#### {v}"
    return question, answer, str(v)


def build_sft_examples(n: int, seed: int = 0):
    """PromptExamples whose answer is the full chain-of-thought (SFT targets
    teach the reasoning format, reference SFT-then-RL recipe)."""
    from rlinf_tpu.data.datasets import PromptExample

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        q, cot, _ = make_problem(rng)
        out.append(PromptExample(prompt=f"Q: {q}\nA: ", answer=cot))
    return out


def build_rl_examples(n: int, seed: int = 0):
    """PromptExamples whose answer is the FINAL number — graded by the
    verifier ladder, not string match."""
    from rlinf_tpu.data.datasets import PromptExample

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        q, _, ans = make_problem(rng)
        out.append(PromptExample(prompt=f"Q: {q}\nA: ", answer=ans))
    return out


def corpus_texts(n: int, seed: int = 0) -> List[str]:
    """Raw prompt+solution texts for tokenizer training."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        q, cot, _ = make_problem(rng)
        out.append(f"Q: {q}\nA: {cot}\n")
    return out
