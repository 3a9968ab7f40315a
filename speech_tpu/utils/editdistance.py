"""Levenshtein edit distance: native C extension with a pure-Python fallback.

Replaces the reference's `editdistance` C++ dependency (reference:
speech/utils/score.py:1, requirements.txt). The C path handles strings and
integer-id sequences (the two cases scoring actually uses); arbitrary hashable
token sequences (e.g. phoneme strings) are mapped to integer ids first so they
also take the C path.
"""

from __future__ import annotations

from typing import Sequence

try:  # built by `make native`
    from speech_tpu.native import _editdistance

    _HAVE_NATIVE = True
except ImportError:  # pragma: no cover - exercised when native ext is absent
    _editdistance = None
    _HAVE_NATIVE = False


def _eval_py(a: Sequence, b: Sequence) -> int:
    """Two-row DP Levenshtein distance; works on any sequences of comparables."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if lb > la:
        a, b, la, lb = b, a, lb, la
    row = list(range(lb + 1))
    for i in range(1, la + 1):
        prev_diag, row[0] = row[0], i
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cur = row[j]
            best = min(prev_diag + (ai != b[j - 1]), cur + 1, row[j - 1] + 1)
            row[j] = best
            prev_diag = cur
    return row[lb]


def _to_ids(a: Sequence, b: Sequence) -> tuple[list[int], list[int]]:
    """Map arbitrary hashable symbols to small ints so the C path applies."""
    table: dict = {}
    def ids(seq):
        out = []
        for s in seq:
            v = table.get(s)
            if v is None:
                v = table[s] = len(table)
            out.append(v)
        return out
    return ids(a), ids(b)


def eval(a: Sequence, b: Sequence) -> int:  # noqa: A001 - mirrors editdistance.eval
    """Levenshtein distance between two symbol sequences."""
    if _HAVE_NATIVE:
        try:
            return _editdistance.eval(a, b)
        except TypeError:
            ia, ib = _to_ids(a, b)
            return _editdistance.eval(ia, ib)
    return _eval_py(a, b)


def have_native() -> bool:
    return _HAVE_NATIVE
