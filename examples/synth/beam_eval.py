"""Beam-search evaluation of the trained synth checkpoints.

Adds ``{dev,test}_per_beam{N}`` entries to examples/synth/RESULTS.json for
each family that has a best checkpoint (run after run_all.py): CTC prefix
beam (decode/ctc_beam.py), seq2seq beam (decode/seq2seq_beam.py), and
transducer beam (decode/rnnt_beam.py) — the reference's beam paths are
per-utterance numpy/C loops (reference ctc_model.py:55-60,
transducer_model.py:92-101, seq2seq.py:180-227).

Usage: python examples/synth/beam_eval.py [--beam 4] [--families ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
RESULTS = os.path.join(HERE, "RESULTS.json")
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
os.chdir(REPO_ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--families", default="ctc,seq2seq,transducer")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lm", help="bigram LM table for the CTC prefix beam "
                    "(build_lm.py output, e.g. examples/synth/synth_lm.npz); "
                    "writes {split}_per_beam{N}_lm rows. CTC only.")
    args = ap.parse_args()
    if args.lm and args.families != "ctc":
        ap.error("--lm applies to the CTC prefix beam; pass --families ctc")

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "eval_driver", os.path.join(REPO_ROOT, "eval.py"))
    eval_driver = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_driver)

    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f)

    for family in args.families.split(","):
        save_path = os.path.join(HERE, "models", family)
        if not os.path.isdir(save_path):
            print(f"=== {family}: no checkpoint at {save_path}, skipping")
            continue
        entry = results.setdefault(family, {})
        for split in ("dev", "test"):
            manifest = os.path.join(HERE, "data", f"{split}.json")
            t0 = time.time()
            per = eval_driver.run(save_path, manifest,
                                  batch_size=args.batch_size, tag="best",
                                  beam_size=args.beam, lm_path=args.lm)
            if args.lm:
                entry[f"{split}_per_beam{args.beam}_lm"] = round(float(per), 4)
                entry[f"{split}_lm_eval_wall_s"] = round(time.time() - t0, 1)
            else:
                entry[f"{split}_per_beam{args.beam}"] = round(float(per), 4)
                entry[f"{split}_beam_eval_wall_s"] = round(time.time() - t0, 1)
            print(f"=== {family} {split} beam-{args.beam}"
                  f"{' +LM' if args.lm else ''} PER {per:.4f}", flush=True)
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
