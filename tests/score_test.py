"""Scoring tests (reference speech/utils/score.py:7-18 semantics)."""

import pytest

from speech_tpu.utils import editdistance
from speech_tpu.utils.score import compute_cer, compute_wer


cases = [
    ("", "", 0),
    ("abc", "abc", 0),
    ("abc", "", 3),
    ("", "abc", 3),
    ("kitten", "sitting", 3),
    ("flaw", "lawn", 2),
    ([1, 2, 3], [1, 3], 1),
    ([1, 2, 3, 4], [2, 3, 4, 5], 2),
    (["ax", "b", "cx"], ["ax", "cx"], 1),  # multi-char symbols
]


@pytest.mark.parametrize("a,b,d", cases)
def test_editdistance(a, b, d):
    assert editdistance.eval(a, b) == d
    assert editdistance.eval(b, a) == d


@pytest.mark.parametrize("a,b,d", cases)
def test_editdistance_py_fallback(a, b, d):
    assert editdistance._eval_py(a, b) == d


def test_compute_cer():
    # dist 1 over total label length 6 -> 1/6
    results = [("abc", "abc"), ("abc", "ab")]
    assert compute_cer(results) == pytest.approx(1 / 6)


def test_compute_cer_empty_labels_raises():
    with pytest.raises(ValueError):
        compute_cer([("", "x")])


def test_compute_wer():
    results = [("the cat sat", "the cat sat"), ("a b", "a c")]
    assert compute_wer(results) == pytest.approx(1 / 5)
