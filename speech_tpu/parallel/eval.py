"""Distributed evaluation: sharded inference + global error-rate reduction.

The reference evaluates serially on one device (reference eval.py:12-18;
SURVEY §2.2 "Distributed eval: No"). Here the forward/decode compute runs
SPMD over the mesh ``data`` axis (batches are device_put with leading-axis
sharding, so every jitted call inside ``infer_batch`` partitions
automatically), each host scores its own shard's (label, prediction) pairs
with the native edit distance, and the (distance, length) partial sums are
reduced across processes — corpus CER is exact, not averaged-of-averages.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from speech_tpu.parallel.mesh import batch_sharding, pad_batch_to_multiple
from speech_tpu.training.trainer import infer_batch, make_infer_step
from speech_tpu.utils import editdistance


def _global_sum(values: np.ndarray) -> np.ndarray:
    """Sum a small host array across all JAX processes (identity when
    single-process)."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(values)
    return np.asarray(gathered).sum(axis=0)


def distributed_eval(model, params, loader, preproc, mesh,
                     beam_size: int = 0, max_len: int = 200,
                     frontend=None) -> tuple[float, float]:
    """Returns (mean dev loss, corpus CER) over the full dataset.

    ``loader`` yields this host's batches (all hosts iterate the same manifest
    in lockstep for single-process runs; for multi-host, give each host its
    own shard of the manifest). ``frontend``: optional on-device featurizer
    applied (jitted) before inference when the loader ships raw waveforms.
    """
    sharding = batch_sharding(mesh)
    n_data = mesh.shape["data"]
    dist_sum, len_sum, loss_sum, n_utts = 0, 0, 0.0, 0

    @jax.jit
    def per_utt_loss(p, b):
        return model.apply({"params": p}, b, method="per_utterance_loss")

    featurize = jax.jit(frontend.featurize) if frontend is not None else None
    infer_step = make_infer_step(model, max_len=max_len) \
        if beam_size == 0 else None

    for batch in loader:
        n_valid = batch.pop("_n_valid", None)  # pad_last loaders
        if featurize is not None and "waveforms" in batch:
            batch = dict(batch)
            batch["inputs"] = np.asarray(featurize(batch.pop("waveforms")))
        true_b = batch["inputs"].shape[0] if n_valid is None else n_valid
        batch = pad_batch_to_multiple(batch, n_data)
        sharded = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        # Per-UTTERANCE losses so padded rows and ragged final batches cannot
        # bias the corpus mean (loss methods are batch means over padding too).
        losses = np.asarray(per_utt_loss(params, sharded))
        preds = infer_batch(model, params, sharded, max_len=max_len,
                            beam_size=beam_size, infer_step=infer_step)
        loss_sum += float(losses[:true_b].sum())
        n_utts += true_b
        for i in range(true_b):
            u = int(batch["label_lengths"][i])
            if u == 0:
                continue  # padding row
            label = preproc.decode(batch["labels"][i, :u].tolist())
            pred = preproc.decode(preds[i])
            dist_sum += editdistance.eval(label, pred)
            len_sum += len(label)

    sums = _global_sum(np.array([dist_sum, len_sum], np.int64))
    loss_arr = _global_sum(np.array([loss_sum, n_utts], np.float64))
    cer = float(sums[0]) / max(float(sums[1]), 1.0)
    mean_loss = float(loss_arr[0]) / max(float(loss_arr[1]), 1.0)
    return mean_loss, cer
