"""Fuzz the cognitive-map parser/scorer: arbitrary garbage must never raise
and scores must stay in [0, 1]."""

import random
import string

from spacer_tpu.rewards import (
    accuracy_reward,
    calculate_prediction_score,
    extract_map_data,
)

OBJECTS = ["table", "chair", "window", "ceiling light", "tv"]


def _random_garbage(rng, n=200):
    pieces = []
    for _ in range(n):
        choice = rng.random()
        if choice < 0.3:
            pieces.append(rng.choice(OBJECTS))
        elif choice < 0.5:
            pieces.append(str(rng.randint(-999, 999)))
        elif choice < 0.6:
            pieces.append(rng.choice("{}[]()<>:,.'\"\\"))
        else:
            pieces.append(
                "".join(rng.choice(string.printable) for _ in range(rng.randint(1, 8)))
            )
    return " ".join(pieces)


def test_extract_map_data_never_raises():
    rng = random.Random(0)
    for i in range(200):
        s = _random_garbage(rng)
        out = extract_map_data(s, OBJECTS)
        assert isinstance(out, dict)
        for k, coords in out.items():
            assert k in [o.lower() for o in OBJECTS]
            for pair in coords:
                assert len(pair) == 2
                assert all(isinstance(x, int) for x in pair)


def test_prediction_score_bounded():
    rng = random.Random(1)
    for _ in range(100):
        def rand_map():
            return {
                rng.choice(OBJECTS): [
                    [rng.randint(-5, 15), rng.randint(-5, 15)]
                    for _ in range(rng.randint(0, 4))
                ]
                for _ in range(rng.randint(0, 3))
            }

        score = calculate_prediction_score(rand_map(), rand_map(), 10)
        assert 0.0 <= score <= 1.0


def test_accuracy_reward_never_raises_on_garbage():
    rng = random.Random(2)
    map_data = {"v": {"cognitive_map": {"table": [[1, 2]]},
                      "object_list": ["table"]}}
    for qtype in ["multiple choice", "numerical", "OCR", "free-form",
                  "regression", "unknown"]:
        completions = [[{"content": _random_garbage(rng, 50)}] for _ in range(4)]
        out = accuracy_reward(
            completions, ["<answer>3</answer>"] * 4, ["/x/v.mp4"] * 4,
            map_data=map_data, problem_type=[qtype],
        )
        assert len(out) == 4
        assert all(isinstance(r, float) and r >= 0.0 for r in out)
