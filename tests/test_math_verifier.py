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


# ---------------------------------------------------------------------------
# Reference-grade equivalence vectors (reference math_equal verify.py:149)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "pred,ref,ok",
    [
        # nested fractions / latex forms
        (r"\frac{\frac{1}{2}}{3}", "1/6", True),
        (r"\dfrac{3}{4}", "0.75", True),
        (r"\frac{2}{3}", r"-\frac{2}{3}", False),
        # sqrt / pi / symbolic numerics
        (r"\frac{\sqrt{2}}{2}", "0.7071067", True),
        (r"2\pi", "6.283185", True),
        (r"\sqrt[3]{8}", "2", True),
        # percent forms (reference include_percentage)
        ("0.5", "50\\%", True),
        ("50", "0.5", True),
        # scientific notation
        ("3e5", "300000", True),
        # equations
        ("x = 5", "5", True),
        ("y=2x+1", "y = 1 + 2x", True),
        ("2x + 1 = y", "y = 2x + 1", True),
        # tuples / intervals
        ("(1, 1/2)", "(1, 0.5)", True),
        ("[0, 1]", "[0, 2]", False),
        # matrices
        (r"\begin{pmatrix}1\\2\end{pmatrix}",
         r"\begin{pmatrix}1\\2\end{pmatrix}", True),
        (r"\begin{bmatrix}1&0\\0&1\end{bmatrix}",
         r"\begin{pmatrix}1&0\\0&1\end{pmatrix}", True),
        (r"\begin{pmatrix}1\\2\end{pmatrix}",
         r"\begin{pmatrix}1\\3\end{pmatrix}", False),
        (r"\begin{pmatrix}1\\2\end{pmatrix}", "{1, 2}", True),
        # mixed symbolic
        ("(x+1)^2", "x^2 + 2x + 1", True),
        (r"\text{4 dollars}", "4", True),
        ("1{,}000", "1000", True),
    ],
)
def test_reference_grade_vectors(pred, ref, ok):
    from rlinf_tpu.algorithms.rewards.math_verifier import math_equal

    assert math_equal(pred, ref) == ok, (pred, ref)


def test_gsm8k_hash_extraction():
    text = "Step 1... Step 2...\n#### 72"
    assert extract_answer(text) == "72"
    assert math_reward(text, "72") == 1.0


def test_answer_tag_extraction():
    assert extract_answer("<answer>  42 </answer>") == "42"


def test_batch_pool_with_timeout():
    from rlinf_tpu.algorithms.rewards.math_verifier import math_verify_call

    oks = math_verify_call(
        [r"the answer is \boxed{\frac{1}{2}}", r"\boxed{42}", "no answer x"],
        ["0.5", ["41", "42"], "7"],
        timeout=30.0,
    )
    assert oks == [True, True, False]


def test_multiple_choice_cleanup():
    from rlinf_tpu.algorithms.rewards.math_verifier import math_equal

    assert math_equal("The answer is (B).", "B")
    assert math_equal("C", "B") is False
