"""Math answer extraction + grading behaviors."""

import pytest

from rlinf_tpu.algorithms.rewards.math_verifier import (
    extract_answer,
    grade_answer,
    math_reward,
)


@pytest.mark.parametrize(
    "text,expected",
    [
        (r"The answer is \boxed{42}.", "42"),
        (r"\boxed{\frac{1}{2}}", r"\frac{1}{2}"),
        (r"first \boxed{1} then \boxed{2}", "2"),
        (r"nested \boxed{\sqrt{2}+1}", r"\sqrt{2}+1"),
        ("So the final answer is 17", "17"),
        ("x = 3.5 therefore y = 7.25", "7.25"),
        ("big numbers: 1,234,567 total", "1234567"),
        ("no numbers here", None),
    ],
)
def test_extract_answer(text, expected):
    assert extract_answer(text) == expected


@pytest.mark.parametrize(
    "pred,ref,ok",
    [
        ("42", "42", True),
        ("42.0", "42", True),
        ("42", "43", False),
        (r"\frac{1}{2}", "0.5", True),
        (r"\frac{1}{2}", "1/2", True),
        ("50\\%", "50", True),
        ("$3.50$", "3.50", True),
        ("1,000", "1000", True),
        ("0.33333333", "1/3", True),
        ("(1, 2)", "(1,2)", True),
        ("(1, 2)", "(1,3)", False),
        (r"\sqrt{2}", "sqrt(2)", True),
        ("2x+1", "1+2x", True),        # symbolic
        ("-5", "-5.000", True),
        (".5", "0.5", True),
        ("A", "a", True),
    ],
)
def test_grade_answer(pred, ref, ok):
    assert grade_answer(pred, ref) == ok


def test_math_reward_end_to_end():
    sol = "We compute 6*7 = 42. The answer is \\boxed{42}."
    assert math_reward(sol, "42") == 1.0
    assert math_reward(sol, "41") == 0.0
    assert math_reward("", "42") == 0.0
