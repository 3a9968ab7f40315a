"""Corpus-level error-rate scoring.

Capability parity with the reference's ``speech/utils/score.py``:
``compute_cer`` (reference score.py:7-18) takes ``(label, prediction)`` pairs
and returns total edit distance divided by total label length — corpus-level
CER (or PER when the symbols are phonemes, WER when they are words).
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

from speech_tpu.utils import editdistance


def compute_cer(results: Iterable[Tuple[Sequence, Sequence]]) -> float:
    """Corpus-level character/symbol error rate.

    Args:
      results: iterable of ``(label, prediction)`` sequence pairs. Symbols may
        be characters, integer ids, or phoneme strings.

    Returns:
      sum(edit_distance(label, pred)) / sum(len(label)).
    """
    results = list(results)
    dist = sum(editdistance.eval(label, pred) for label, pred in results)
    total = sum(len(label) for label, _ in results)
    if total == 0:
        raise ValueError("No labels to score (total label length is zero).")
    return dist / total


def compute_wer(results: Iterable[Tuple[str, str]]) -> float:
    """Corpus-level word error rate over (label, prediction) string pairs."""
    return compute_cer([(label.split(), pred.split()) for label, pred in results])
