"""JSONL dataset manifests.

Same on-disk format as the reference (reference: speech/loader.py:168-170) so
datasets prepared for either framework are interchangeable: one JSON object per
line with keys ``text`` (transcript string or token list), ``duration``
(seconds, float) and ``audio`` (path to a wav file).
"""

from __future__ import annotations

import json
from typing import Any


def read_data_json(data_json: str) -> list[dict[str, Any]]:
    """Read a JSONL manifest into a list of example dicts."""
    with open(data_json) as fid:
        return [json.loads(line) for line in fid if line.strip()]


def write_data_json(data: list[dict[str, Any]], path: str) -> None:
    """Write a JSONL manifest (used by the dataset recipes)."""
    with open(path, "w") as fid:
        for d in data:
            fid.write(json.dumps(d) + "\n")
