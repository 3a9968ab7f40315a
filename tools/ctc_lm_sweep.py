"""Tune the CTC beam's bigram-LM weights on dev posteriors, score test.

Protocol: compute (once, cached to .npz) the CTC checkpoint's log-posteriors
for the dev and test splits; then sweep (alpha, beta) over the cached arrays
with the device beam (decode/ctc_beam.py) — decode-only sweeps are cheap, the
model forward is the expensive part. Picks the best (alpha, beta) by dev PER
and reports test PER at that single setting (no test peeking).

tools/ctc_beam_probe.py established WHY the no-LM beam trails greedy here:
it finds strictly likelier labelings containing extra insertions. ``beta``
(per-symbol insertion bonus, negative = penalty) targets that directly;
``alpha`` weights the bigram log-prob (reference LM hook:
speech/models/ctc_decoder.py:95).

Usage:
    python tools/ctc_lm_sweep.py [--beam 8] [--cache /tmp/ctc_posteriors]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import speech_tpu  # noqa: E402
from speech_tpu.data.loader import make_loader  # noqa: E402
from speech_tpu.decode.ctc_beam import ctc_beam_decode  # noqa: E402
from speech_tpu.decode.ctc_greedy import ctc_greedy_decode  # noqa: E402
from speech_tpu.utils import editdistance  # noqa: E402


def get_posteriors(model, params, preproc, manifest, cache_path):
    if os.path.exists(cache_path):
        z = np.load(cache_path, allow_pickle=True)
        return list(z["lps"]), list(z["lengths"]), list(z["labels"])
    loader = make_loader(manifest, preproc, 8, drop_last=False, pad_last=True)
    lps, lengths, labels = [], [], []
    for batch in loader:
        n_valid = batch.pop("_n_valid", len(batch["input_lengths"]))
        lp, lens = model.apply({"params": params}, batch, method="log_probs")
        lp, lens = np.asarray(lp), np.asarray(lens)
        for i in range(int(n_valid)):
            u = int(batch["label_lengths"][i])
            lps.append(lp[i, : int(lens[i])])
            lengths.append(int(lens[i]))
            labels.append(batch["labels"][i, :u].tolist())
    # build the object arrays explicitly: np.asarray(list, dtype=object)
    # collapses to a 3-D object array when every element shares one shape
    lps_arr = np.empty(len(lps), object)
    lps_arr[:] = lps
    labels_arr = np.empty(len(labels), object)
    labels_arr[:] = labels
    np.savez(cache_path, lps=lps_arr, lengths=np.asarray(lengths),
             labels=labels_arr)
    return lps, lengths, labels


def per_for(lps, lengths, labels, blank, beam, lm_table=None):
    dist = total = 0
    for lp, length, truth in zip(lps, lengths, labels):
        if beam == 0:
            pred = ctc_greedy_decode(lp[None], np.asarray([length], np.int32),
                                     blank=blank)[0]
        else:
            preds, _ = ctc_beam_decode(lp[None], np.asarray([length], np.int32),
                                       beam_size=beam, blank=blank,
                                       lm_logp=lm_table)
            pred = preds[0]
        dist += editdistance.eval(truth, pred)
        total += len(truth)
    return dist / total


def make_table(log_probs, nclass, alpha, beta):
    v = log_probs.shape[1]
    t = np.zeros((nclass + 1, nclass), np.float32)
    t[: v + 1, :v] = (alpha * log_probs + beta).astype(np.float32)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="examples/synth/models/ctc")
    ap.add_argument("--beam", type=int, default=8)
    ap.add_argument("--cache", default="/tmp/ctc_posteriors")
    ap.add_argument("--alphas", default="0,0.2,0.4,0.7,1.0")
    ap.add_argument("--betas", default="0,-0.3,-0.6,-1.0,-1.5")
    args = ap.parse_args()

    bundle = speech_tpu.load(args.model, tag="best")
    model, params, preproc = bundle.model, bundle.params, bundle.preproc
    blank = model.blank
    nclass = preproc.vocab_size + 1

    split_data = {}
    for split in ("dev", "test"):
        man = os.path.join(REPO, "examples", "synth", "data", f"{split}.json")
        split_data[split] = get_posteriors(
            model, params, preproc, man, f"{args.cache}_{split}.npz")
        print(f"{split}: {len(split_data[split][0])} utts cached")

    # bigram log-probs from the training transcripts (build_lm's estimator)
    sys.path.insert(0, os.path.join(REPO, "examples", "synth"))
    from build_lm import bigram_counts

    counts = bigram_counts(
        os.path.join(REPO, "examples", "synth", "data", "train.json"), preproc)
    probs = counts + 0.5
    probs /= probs.sum(axis=1, keepdims=True)
    log_probs = np.log(probs)

    dev = split_data["dev"]
    print(f"dev greedy PER {per_for(*dev, blank, 0):.4f}")
    print(f"dev beam-{args.beam} no-LM PER {per_for(*dev, blank, args.beam):.4f}")

    best = (None, 1e9)
    for a, b in itertools.product(
            [float(x) for x in args.alphas.split(",")],
            [float(x) for x in args.betas.split(",")]):
        table = make_table(log_probs, nclass, a, b)
        per = per_for(*dev, blank, args.beam, table)
        print(f"  alpha {a:4.1f} beta {b:4.1f}: dev PER {per:.4f}")
        if per < best[1]:
            best = ((a, b), per)

    (a, b), dev_per = best
    test = split_data["test"]
    table = make_table(log_probs, nclass, a, b)
    test_per = per_for(*test, blank, args.beam, table)
    test_greedy = per_for(*test, blank, 0)
    test_nolm = per_for(*test, blank, args.beam)
    out = {"beam": args.beam, "alpha": a, "beta": b,
           "dev_per_lm": round(dev_per, 4),
           "test_per_greedy": round(test_greedy, 4),
           "test_per_beam_nolm": round(test_nolm, 4),
           "test_per_beam_lm": round(test_per, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
