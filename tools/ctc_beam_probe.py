"""Investigate the CTC beam-vs-greedy PER gap on REAL eval posteriors.

VERDICT r4 weak #1: on the synth corpus the CTC prefix beam (beam 4) scored
WORSE than greedy on both splits (dev 0.0604->0.0629, test 0.0585->0.0625).
This probe answers, on actual checkpoint posteriors (not random small-shape
test tensors):

  1. device-vs-host parity: does the batched on-device beam
     (decode/ctc_beam.py:_beam_scan) produce the same labels and scores as
     the host oracle (decode/ctc_beam.py:decode) on real posteriors?
  2. search quality: does the beam find labelings with HIGHER sum-over-
     alignment likelihood than the greedy collapse (it should, by design)?
  3. accuracy: PER for greedy and beam in {2,4,8,16} — is the regression
     monotone in width (pointing at a modeling effect: better search finds
     likelier-but-wronger labelings) or non-monotone (pointing at a bug)?
  4. per-utterance diffs: where beam != greedy, who is closer to the truth,
     and what do the edits look like (drops/inserts/substitutions)?

Run on CPU (the forward pass is the slow part; use --limit):
    python tools/ctc_beam_probe.py [--split dev] [--limit 200] [--host-check 24]
"""

from __future__ import annotations

import argparse
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
from speech_tpu.decode.ctc_beam import ctc_beam_decode, decode  # noqa: E402
from speech_tpu.decode.ctc_greedy import ctc_greedy_decode  # noqa: E402
from speech_tpu.ops.ctc import ctc_loss  # noqa: E402
from speech_tpu.utils import editdistance  # noqa: E402

edit_distance = editdistance.eval


def label_nll(log_probs, length, labels, blank):
    """-log p(labels | x) summed over all alignments (the quantity the beam
    maximizes, computed exactly by the CTC forward)."""
    lp = np.asarray(log_probs)[None, :, :]
    lab = np.asarray(labels, np.int32)[None, :]
    if lab.size == 0:
        lab = np.zeros((1, 1), np.int32)
        ulen = np.asarray([0], np.int32)
    else:
        ulen = np.asarray([lab.shape[1]], np.int32)
    # ctc_loss applies log_softmax internally; log-probs are a fixed point of
    # log_softmax (they already normalize), so passing them is exact.
    loss = ctc_loss(lp, np.asarray([length], np.int32), lab, ulen, blank=blank)
    return float(np.asarray(loss)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="dev")
    ap.add_argument("--limit", type=int, default=200)
    ap.add_argument("--model", default="examples/synth/models/ctc")
    ap.add_argument("--beams", default="2,4,8,16")
    ap.add_argument("--host-check", type=int, default=24,
                    help="cross-check device beam-4 vs host oracle on this "
                    "many utterances of real posteriors")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    bundle = speech_tpu.load(args.model, tag="best")
    model, params, preproc = bundle.model, bundle.params, bundle.preproc
    manifest = os.path.join(REPO, "examples", "synth", "data",
                            f"{args.split}.json")
    loader = make_loader(manifest, preproc, args.batch_size, drop_last=False,
                         pad_last=True)

    utts = []  # (log_probs (T,V), length, label list)
    for batch in loader:
        n_valid = batch.pop("_n_valid", len(batch["input_lengths"]))
        lp, lengths = model.apply({"params": params}, batch,
                                  method="log_probs")
        lp, lengths = np.asarray(lp), np.asarray(lengths)
        for i in range(int(n_valid)):
            u = int(batch["label_lengths"][i])
            utts.append((lp[i], int(lengths[i]),
                         batch["labels"][i, :u].tolist()))
            if len(utts) >= args.limit:
                break
        if len(utts) >= args.limit:
            break
    print(f"{len(utts)} utterances, blank={model.blank}")

    # --- 1. device vs host parity on real posteriors ---
    mism = 0
    for lp, length, _ in utts[: args.host_check]:
        dev_labels, dev_nll = ctc_beam_decode(lp[None, :length],
                                              np.asarray([length], np.int32),
                                              beam_size=4, blank=model.blank)
        host_labels, host_nll = decode(lp[:length], beam_size=4,
                                       blank=model.blank, is_log=True)
        if list(host_labels) != dev_labels[0]:
            mism += 1
            print(f"  PARITY MISMATCH: host {list(host_labels)} "
                  f"dev {dev_labels[0]}")
        elif abs(float(dev_nll[0]) - host_nll) > 1e-3:
            mism += 1
            print(f"  SCORE MISMATCH: host {host_nll:.4f} "
                  f"dev {float(dev_nll[0]):.4f}")
    print(f"parity: {args.host_check - mism}/{args.host_check} "
          f"device==host on real posteriors")

    # --- 2+3. PER and label-likelihood vs beam width ---
    def per_of(preds):
        dist = sum(edit_distance(t, p) for (_, _, t), p in zip(utts, preds))
        total = sum(len(t) for _, _, t in utts)
        return dist / total

    greedy = [
        ctc_greedy_decode(lp[None], np.asarray([length], np.int32),
                          blank=model.blank)[0]
        for lp, length, _ in utts
    ]
    print(f"greedy PER {per_of(greedy):.4f}")

    beam_preds = {}
    for k in [int(x) for x in args.beams.split(",")]:
        preds = []
        for lp, length, _ in utts:
            labels, _ = ctc_beam_decode(lp[None, :length],
                                        np.asarray([length], np.int32),
                                        beam_size=k, blank=model.blank)
            preds.append(labels[0])
        beam_preds[k] = preds
        # search quality: sum-over-alignment NLL of the beam's labeling vs
        # greedy's labeling (lower is likelier; beam should win or tie)
        beam_better = greedy_better = ties = 0
        for (lp, length, _), bp, gp in zip(utts, preds, greedy):
            if bp == gp:
                ties += 1
                continue
            nb = label_nll(lp, length, bp, model.blank)
            ng = label_nll(lp, length, gp, model.blank)
            if nb < ng - 1e-6:
                beam_better += 1
            elif ng < nb - 1e-6:
                greedy_better += 1
            else:
                ties += 1
        print(f"beam {k:2d}: PER {per_of(preds):.4f}  (vs greedy: "
              f"beam-labeling likelier on {beam_better}, greedy-labeling "
              f"likelier on {greedy_better}, same labels/score on {ties})")

    # --- 4. per-utterance diffs for beam 4 ---
    k = 4
    b_win = g_win = even = 0
    len_delta = []
    for (lp, length, truth), bp, gp in zip(utts, beam_preds[k], greedy):
        if bp == gp:
            continue
        db, dg = edit_distance(truth, bp), edit_distance(truth, gp)
        len_delta.append(len(bp) - len(gp))
        if db < dg:
            b_win += 1
        elif dg < db:
            g_win += 1
        else:
            even += 1
    n_diff = b_win + g_win + even
    print(f"beam-4 vs greedy on {n_diff} differing utts: beam closer {b_win},"
          f" greedy closer {g_win}, tie {even}; "
          f"mean len(beam)-len(greedy) {np.mean(len_delta) if len_delta else 0:+.2f}")
    out = {
        "split": args.split, "n": len(utts),
        "greedy_per": round(per_of(greedy), 4),
        "beam_per": {k: round(per_of(p), 4) for k, p in beam_preds.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
