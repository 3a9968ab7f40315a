"""TIMIT scoring with the reduced 39-phone set.

Capability parity with the reference scorer (reference: examples/timit/
score.py:11-32): remap both predictions and labels 48->39, then corpus-level
PER. Input: the JSONL prediction dump written by ``eval.py --save``.

Usage: python score.py <predictions.json>
"""

from __future__ import annotations

import argparse
import json

from speech_tpu.utils.score import compute_cer

import preprocess


def remap(data):
    _, m48_39 = preprocess.load_phone_map()
    for d in data:
        d["prediction"] = [m48_39[p] for p in d["prediction"]]
        d["label"] = [m48_39[p] for p in d["label"]]


def main():
    parser = argparse.ArgumentParser(
        description="PER on TIMIT with the reduced 39-phone set.")
    parser.add_argument("data_json", help="JSONL prediction dump from eval.py --save")
    args = parser.parse_args()
    with open(args.data_json) as fid:
        data = [json.loads(line) for line in fid]
    remap(data)
    per = compute_cer((d["label"], d["prediction"]) for d in data)
    print(f"PER {per:.3f}")


if __name__ == "__main__":
    main()
