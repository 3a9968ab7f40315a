"""Evaluate a saved model on a dataset manifest.

Usage (reference-compatible, reference eval.py:47-63):
    python eval.py <model_dir> <dataset.json> [--last] [--save out.json]

Loads the ``best``-tagged checkpoint by default (``--last`` selects the most
recent untagged one, reference eval.py:55-62), runs batch inference, prints
corpus CER/PER, and optionally dumps per-utterance predictions as JSONL.
"""

import argparse
import json

import speech_tpu
from speech_tpu.data.loader import make_loader
from speech_tpu.training.trainer import infer_batch, make_infer_step
from speech_tpu.utils.score import compute_cer


def run(model_path: str, dataset_json: str, batch_size: int = 8,
        tag: str = "best", out_file=None, beam_size: int = 0,
        n_seq: int = 1, lm_path: str = None):
    bundle = speech_tpu.load(model_path, tag=tag)
    # Persistent XLA compile cache, honoring the training config's settings
    # (same semantics as trainer.run): eval compiles one program per bucket
    # shape — on slow/remote compile services that dominated beam-eval wall
    # time on repeat runs.
    if bundle.config.get("compilation_cache", True):
        from speech_tpu.training.trainer import enable_compilation_cache

        enable_compilation_cache(bundle.config.get("compilation_cache_dir"))
    model, params, preproc = bundle.model, bundle.params, bundle.preproc
    loader = make_loader(dataset_json, preproc, batch_size, drop_last=False,
                         pad_last=True)

    lm_logp = None
    if lm_path is not None:
        # Dense bigram LM table for the CTC prefix beam, shape (V+2, V+1):
        # lm_logp[last+1, s] (row 0 = empty prefix). .npy, or .npz under key
        # "lm_logp". See decode.ctc_beam.ctc_beam_decode.
        import numpy as np
        loaded = np.load(lm_path)
        lm_logp = loaded["lm_logp"] if hasattr(loaded, "files") else loaded
        if beam_size == 0:
            raise ValueError("--lm requires a beam (--beam N); the greedy "
                             "decoder has no LM extension point")

    # Config key ``parallel.n_seq`` (saved with the checkpoint) selects
    # sequence-parallel inference when the CLI flag is left at its default.
    if n_seq == 1:
        n_seq = int(bundle.config.get("parallel", {}).get("n_seq", 1))

    # Greedy/beam decode budget: the training run wrote ``model.
    # max_decode_len`` into the checkpointed config (trainer.run) — defaulted
    # from the train manifest's max label length so long transcripts decode
    # untruncated.
    max_len = int(bundle.config.get("model", {}).get("max_decode_len", 200))

    # One jitted greedy program per bucket shape, reused across the corpus.
    if n_seq > 1:
        # Sequence-parallel inference: encoder time axis sharded over n_seq
        # devices (SURVEY §5.7) — for audio too long for one chip's HBM.
        from speech_tpu.parallel.seqparallel import (make_seq_infer_step,
                                                     make_seq_mesh)

        if beam_size != 0:
            raise NotImplementedError("--n-seq currently decodes greedily")
        infer_step = make_seq_infer_step(model, make_seq_mesh(n_seq),
                                         max_len=max_len)
    else:
        # Built for beam evals too: the CTC beam consumes the jitted
        # log_probs program (infer_batch); seq2seq/transducer beams carry
        # their own hoisted encode+search programs and ignore it.
        infer_step = make_infer_step(model, max_len=max_len)
    all_preds, all_labels = [], []
    for batch in loader:
        n_valid = batch.pop("_n_valid", len(batch["input_lengths"]))
        preds = infer_batch(model, params, batch, max_len=max_len,
                            beam_size=beam_size, infer_step=infer_step,
                            lm_logp=lm_logp)
        preds = preds[:n_valid]
        for b in range(len(preds)):
            u = int(batch["label_lengths"][b])
            all_labels.append(batch["labels"][b, :u].tolist())
            all_preds.append(preds[b])

    results = [(preproc.decode(l), preproc.decode(p))
               for l, p in zip(all_labels, all_preds)]
    cer = compute_cer(results)
    print(f"CER {cer:.3f}")

    if out_file is not None:
        with open(out_file, "w") as fid:
            for label, pred in results:
                res = {"prediction": pred, "label": label}
                fid.write(json.dumps(res) + "\n")
    return cer


def main():
    parser = argparse.ArgumentParser(description="Evaluate a saved model.")
    parser.add_argument("model", help="Checkpoint directory (save_path)")
    parser.add_argument("dataset", help="JSONL manifest to evaluate")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--last", default=False, action="store_true",
                        help="Use the last saved model instead of the best")
    parser.add_argument("--save", help="Write per-utterance predictions (JSONL)")
    parser.add_argument("--beam", type=int, default=0,
                        help="Beam width (0 = greedy decode)")
    parser.add_argument("--n-seq", type=int, default=1,
                        help="Shard the encoder time axis over N devices "
                             "(sequence-parallel inference for long audio)")
    parser.add_argument("--lm", help="Dense bigram LM table (.npy / .npz "
                        "key 'lm_logp', shape (V+2, V+1)) folded into the "
                        "CTC prefix-beam extension scores")
    args = parser.parse_args()
    run(args.model, args.dataset, batch_size=args.batch_size,
        tag=None if args.last else "best", out_file=args.save,
        beam_size=args.beam, n_seq=args.n_seq, lm_path=args.lm)


if __name__ == "__main__":
    main()
