"""Math answer extraction + grading (rule-based reasoning reward).

From-scratch implementation with the capabilities of the reference's verifier
(reference rlinf/algorithms/rewards/math/math_verifier/{verify,parser}.py:
boxed/last-number extraction, LaTeX normalization, numeric equality with
tolerance, fraction/percent handling, sympy symbolic fallback with timeout).

Used by the reward worker analog to score rollout results
(reference rlinf/workers/reward/reward_worker.py:81).
"""

from __future__ import annotations

import re
from typing import List, Optional


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------

def _extract_boxed(text: str) -> Optional[str]:
    r"""Return content of the LAST \boxed{...} (brace-balanced)."""
    idx = text.rfind("\\boxed")
    if idx == -1:
        return None
    i = idx + len("\\boxed")
    # \boxed5 style (no braces)
    while i < len(text) and text[i] == " ":
        i += 1
    if i >= len(text):
        return None
    if text[i] != "{":
        m = re.match(r"[^$\s}]+", text[i:])
        return m.group(0) if m else None
    depth = 0
    start = i + 1
    for j in range(i, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                return text[start:j]
    return None


_NUMBER_RE = re.compile(r"-?\d[\d,]*(?:\.\d+)?")
_ANSWER_PHRASES = [
    r"(?:final answer|answer)\s*(?:is|:)\s*",
]


def extract_answer(text: str, use_last_number: bool = True) -> Optional[str]:
    """Extract the model's final answer: \boxed > 'answer is' > last number."""
    if text is None:
        return None
    boxed = _extract_boxed(text)
    if boxed is not None:
        return boxed.strip()
    for phrase in _ANSWER_PHRASES:
        matches = list(re.finditer(phrase, text, re.IGNORECASE))
        if matches:
            tail = text[matches[-1].end():].strip()
            tail = tail.split("\n")[0].strip().rstrip(".")
            if tail:
                return tail.strip("$ ").strip()
    if use_last_number:
        nums = _NUMBER_RE.findall(text.replace(",", ""))
        if nums:
            return nums[-1]
    return None


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

_UNIT_WORDS = (
    "degrees?|cm|m|km|mm|inches|feet|ft|pounds|lbs|kg|g|hours?|minutes?|"
    "seconds?|dollars?|cents?|units?|square|cubic|percent"
)


def normalize_answer(s: str) -> str:
    """LaTeX/format normalization (reference parser.py strip_string behavior)."""
    if s is None:
        return ""
    s = s.strip()
    s = s.replace("\\!", "").replace("\\,", "").replace("\\ ", " ")
    s = s.replace("\\left", "").replace("\\right", "")
    s = s.replace("\\{", "{").replace("\\}", "}")
    s = s.replace("^{\\circ}", "").replace("^\\circ", "")
    s = s.replace("\\$", "").replace("$", "")
    s = s.replace("\\%", "").replace("%", "")
    s = re.sub(r"\\text\{([^}]*)\}", r"\1", s)
    s = re.sub(r"\\mbox\{([^}]*)\}", r"\1", s)
    s = re.sub(rf"\b({_UNIT_WORDS})\b\.?", "", s, flags=re.IGNORECASE)
    s = s.replace("\\dfrac", "\\frac").replace("\\tfrac", "\\frac")
    # \frac{a}{b} -> a/b ; \frac12 -> 1/2
    s = re.sub(r"\\frac\{([^{}]+)\}\{([^{}]+)\}", r"(\1)/(\2)", s)
    s = re.sub(r"\\frac(\d)(\d)", r"\1/\2", s)
    s = re.sub(r"\\sqrt\{([^{}]+)\}", r"sqrt(\1)", s)
    s = re.sub(r"\\sqrt(\d)", r"sqrt(\1)", s)
    s = s.replace("\\cdot", "*").replace("\\times", "*")
    s = s.replace("\\pi", "pi")
    s = s.replace("\\infty", "oo").replace("\\infinity", "oo")
    s = s.replace(" ", "")
    s = s.replace(",", "")  # thousand separators
    s = s.rstrip(".")
    # 0.5 == .5
    if s.startswith("."):
        s = "0" + s
    # trailing .0
    s = re.sub(r"^(-?\d+)\.0+$", r"\1", s)
    return s.lower()


def _parse_number(s: str) -> Optional[float]:
    s = s.strip()
    try:
        return float(s)
    except ValueError:
        pass
    m = re.fullmatch(r"\(?(-?\d+(?:\.\d+)?)\)?/\(?(-?\d+(?:\.\d+)?)\)?", s)
    if m:
        denom = float(m.group(2))
        if denom != 0:
            return float(m.group(1)) / denom
    return None


def _numeric_equal(a: float, b: float, rel_tol: float = 1e-4) -> bool:
    return abs(a - b) <= rel_tol * max(1.0, abs(a), abs(b))


def _symbolic_equal(a: str, b: str, timeout_s: float = 2.0) -> bool:
    """sympy fallback (reference verify.py:88 symbolic_equal), guarded."""
    try:
        import signal
        from sympy import simplify
        from sympy.parsing.sympy_parser import (
            parse_expr,
            standard_transformations,
            implicit_multiplication_application,
        )

        transformations = standard_transformations + (
            implicit_multiplication_application,
        )

        def parse(s):
            return parse_expr(s, transformations=transformations)

        ea, eb = parse(a), parse(b)
        if ea == eb:
            return True
        return simplify(ea - eb) == 0
    except Exception:
        return False


def grade_answer(prediction: Optional[str], reference: str) -> bool:
    """Is ``prediction`` equivalent to ``reference``?

    Mirrors reference math_equal (verify.py:149): string equality after
    normalization, numeric equality with tolerance (incl. fractions and
    percent forms), multiple-choice letter match, sympy symbolic fallback.
    """
    if prediction is None or reference is None:
        return False
    pred, ref = normalize_answer(str(prediction)), normalize_answer(str(reference))
    if not pred:
        return False
    if pred == ref:
        return True

    # Multiple choice: single letters
    if re.fullmatch(r"[a-e]", ref):
        m = re.search(r"\b([a-e])\b", pred)
        return bool(m and m.group(1) == ref)

    pn, rn = _parse_number(pred), _parse_number(ref)
    if pn is not None and rn is not None:
        if _numeric_equal(pn, rn):
            return True
        # percent forms: 50 vs 0.5
        if _numeric_equal(pn / 100.0, rn) or _numeric_equal(pn, rn / 100.0):
            return True
        return False

    # Tuples/intervals: compare element-wise
    if (pred[:1], pred[-1:]) == (ref[:1], ref[-1:]) and pred[:1] in "([{":
        p_parts = pred[1:-1].split(",")
        r_parts = ref[1:-1].split(",")
        if len(p_parts) == len(r_parts) and len(p_parts) > 1:
            return all(grade_answer(p, r) for p, r in zip(p_parts, r_parts))

    return _symbolic_equal(pred, ref)


def math_reward(
    response_text: str,
    ground_truth: str,
    *,
    correct: float = 1.0,
    incorrect: float = 0.0,
) -> float:
    """Score one response (reference reward_worker.py:81 semantics:
    binary rule reward on extracted answers)."""
    pred = extract_answer(response_text)
    return correct if grade_answer(pred, ground_truth) else incorrect


def batch_math_rewards(
    response_texts: List[str], ground_truths: List[str], **kw
) -> List[float]:
    return [math_reward(t, g, **kw) for t, g in zip(response_texts, ground_truths)]
