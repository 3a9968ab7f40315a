"""Estimate a dense bigram LM table from the synth training transcripts.

Produces the ``lm_logp`` table consumed by the device CTC prefix beam
(speech_tpu/decode/ctc_beam.py: ``lm_logp[last + 1, s]`` added at the
extension point — the device counterpart of the reference's LM hook,
reference speech/models/ctc_decoder.py:95).

Table semantics: ``lm_logp[0, s]`` scores the first symbol of a prefix
(empty-prefix row); ``lm_logp[last + 1, s]`` scores appending ``s`` after
``last``. Entries are ``alpha * log P(s | last) + beta``: ``alpha`` is the
usual LM weight and ``beta`` is a per-symbol insertion bonus (negative =
insertion penalty) — the probe in tools/ctc_beam_probe.py showed the no-LM
beam's errors are insertions (it recovers likelier-but-wrong extra symbols
greedy drops), so a small negative beta directly targets the observed
failure mode. Rows/columns for the blank class are never read by the beam.

Usage:
    python examples/synth/build_lm.py [--alpha 0.4] [--beta -0.6]
        [--out examples/synth/synth_lm.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def bigram_counts(manifest: str, preproc) -> np.ndarray:
    """(V+1, V) counts over train transcripts; row 0 = sentence start."""
    v = preproc.vocab_size
    counts = np.zeros((v + 1, v), np.float64)
    with open(manifest) as f:
        for line in f:
            toks = preproc.encode(json.loads(line)["text"])
            prev = -1  # sentence start
            for t in toks:
                counts[prev + 1, t] += 1
                prev = t
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default=os.path.join(HERE, "data", "train.json"))
    ap.add_argument("--model", default=os.path.join(HERE, "models", "ctc"),
                    help="checkpoint whose preprocessor defines the vocab ids")
    ap.add_argument("--alpha", type=float, default=0.4, help="LM weight")
    ap.add_argument("--beta", type=float, default=-0.6,
                    help="per-symbol insertion bonus (negative = penalty)")
    ap.add_argument("--smooth", type=float, default=0.5,
                    help="add-k smoothing count")
    ap.add_argument("--out", default=os.path.join(HERE, "synth_lm.npz"))
    args = ap.parse_args()

    import speech_tpu

    bundle = speech_tpu.load(args.model, tag="best")
    preproc = bundle.preproc
    v = preproc.vocab_size  # true symbols; blank = v (last class)
    counts = bigram_counts(args.train, preproc)
    probs = counts + args.smooth
    probs /= probs.sum(axis=1, keepdims=True)
    log_probs = np.log(probs)  # (V+1, V)

    # Beam table over the FULL class axis (V+1 incl blank): (V+2, V+1).
    # Blank row/column are never read; keep them 0 so a misuse is visible.
    nclass = v + 1
    lm_logp = np.zeros((nclass + 1, nclass), np.float32)
    lm_logp[: v + 1, :v] = (args.alpha * log_probs + args.beta).astype(
        np.float32)
    np.savez(args.out, lm_logp=lm_logp,
             alpha=np.float32(args.alpha), beta=np.float32(args.beta),
             smooth=np.float32(args.smooth))
    ppl = float(np.exp(-(counts * log_probs).sum() / max(counts.sum(), 1)))
    print(f"wrote {args.out}: table {lm_logp.shape}, vocab {v}, "
          f"train bigram perplexity {ppl:.2f}, "
          f"alpha {args.alpha}, beta {args.beta}")


if __name__ == "__main__":
    main()
