"""Train a speech model from a JSON config.

Usage (reference-compatible, reference train.py:123-146):
    python train.py <config.json> [--deterministic] [--resume]

The config layout matches the reference (data/optimizer/model sections plus
top-level seed and save_path); see examples/*/​*_config.json.
"""

import argparse
import json

from speech_tpu.training import trainer


def main():
    parser = argparse.ArgumentParser(description="Train a speech model.")
    parser.add_argument("config", help="JSON experiment configuration")
    parser.add_argument("--deterministic", default=False, action="store_true",
                        help="Deterministic mode (XLA/TPU is deterministic by "
                             "default; flag kept for interface parity with the "
                             "reference train.py:129-131)")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="Resume from the checkpoint in save_path")
    args = parser.parse_args()

    with open(args.config) as fid:
        config = json.load(fid)

    summary = trainer.run(config, resume=args.resume)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
