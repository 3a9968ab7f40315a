"""Train + evaluate all three model families on the synth corpus.

Sequential (the TPU is single-tenant): for each of ctc / seq2seq /
transducer, run the config to completion, then evaluate the best checkpoint
on dev and test, writing everything to examples/synth/RESULTS.json. PER here
is corpus CER over phone sequences (same metric as the TIMIT recipe's
score.py without the 48->39 remap — the synth inventory has no allophone
map).

Usage: python examples/synth/run_all.py [--families ctc,seq2seq,transducer]
       [--epochs-override N]
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

# The eval driver lives at the repo root; with the documented invocation
# ``python examples/synth/run_all.py`` sys.path[0] is examples/synth, so the
# root must be added explicitly before ``import eval``.
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# Config manifest/save paths are repo-root-relative.
os.chdir(REPO_ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="ctc,seq2seq,transducer")
    ap.add_argument("--epochs-override", type=int, default=0)
    ap.add_argument("--beam", type=int, default=0,
                    help="beam width for eval (0 = greedy)")
    args = ap.parse_args()

    from speech_tpu.training import trainer
    import eval as eval_driver

    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f)

    for family in args.families.split(","):
        cfg_path = os.path.join(HERE, f"{family}_config.json")
        with open(cfg_path) as f:
            config = json.load(f)
        if args.epochs_override:
            config["optimizer"]["epochs"] = args.epochs_override
        print(f"=== {family}: training {config['optimizer']['epochs']} epochs",
              flush=True)
        t0 = time.time()
        summary = trainer.run(config, resume=True)
        train_wall = time.time() - t0

        entry = {"train": summary, "train_wall_s": round(train_wall, 1)}
        for split in ("dev", "test"):
            manifest = os.path.join(HERE, "data", f"{split}.json")
            t0 = time.time()
            per = eval_driver.run(config["save_path"], manifest,
                                  batch_size=16, tag="best",
                                  beam_size=args.beam)
            entry[f"{split}_per"] = round(float(per), 4)
            entry[f"{split}_eval_wall_s"] = round(time.time() - t0, 1)
            print(f"=== {family} {split} PER {per:.4f}", flush=True)
        results[family] = entry
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
