"""Text-math task matcher tests (aime24/math_500 equivalents)."""

from spacer_tpu.evalharness.text_tasks import (
    AIME24,
    MATH_500,
    TASKS_TABLE,
    evaluate_text_task,
    extract_boxed,
    math_answer_match,
)


def test_tasks_table():
    assert [t.name for t in TASKS_TABLE] == ["aime24", "math_500"]


def test_extract_boxed():
    assert extract_boxed(r"so the answer is \boxed{42}") == "42"
    assert extract_boxed(r"\boxed{1} no \boxed{\frac{3}{4}}") == r"\frac{3}{4}"
    assert extract_boxed("the result is 3.14 exactly") == "3.14"
    assert extract_boxed("no numbers") is None


def test_math_answer_match():
    assert math_answer_match(r"\boxed{42}", "42") == 1.0
    assert math_answer_match(r"... \boxed{0.75}", r"\boxed{3/4}") == 1.0
    assert math_answer_match("answer 41", "42") == 0.0
    assert math_answer_match(r"\boxed{1,000}", "1000") == 1.0
    assert math_answer_match("", "42") == 0.0


def test_evaluate_text_task_with_fake_engine():
    rows = [
        {"problem": "1+1?", "solution": r"\boxed{2}"},
        {"problem": "2*3?", "solution": r"\boxed{6}"},
        {"problem": "5-1?", "solution": r"\boxed{4}"},
    ]

    def generate(prompts):
        table = {"1+1?": r"\boxed{2}", "2*3?": r"\boxed{7}",
                 "5-1?": "the answer is 4"}
        return [table[p] for p in prompts]

    out = evaluate_text_task(AIME24, rows, generate, batch_size=2)
    assert out["n"] == 3
    assert abs(out["accuracy"] - 2 / 3) < 1e-9
