"""Profiling subsystem: config-driven trace window + trace summarization."""

import glob
import os
import tempfile

import numpy as np
import pytest

from speech_tpu.training import trainer
from speech_tpu.utils.profiling import summarize_trace


def test_trace_window_via_trainer(tiny_corpus):
    save = tempfile.mkdtemp(prefix="prof_run_")
    cfg = {
        "seed": 11,
        "save_path": save,
        "data": {"train_set": tiny_corpus["manifest"],
                 "dev_set": tiny_corpus["manifest"],
                 "start_and_end": False, "num_workers": 1},
        "optimizer": {"batch_size": 2, "epochs": 1, "learning_rate": 0.05,
                      "momentum": 0.9},
        "model": {"class": "CTC", "dropout": 0.0, "loss_impl": "pure",
                  "encoder": {"conv": [[4, 5, 9, 2]],
                              "rnn": {"dim": 8, "layers": 1,
                                      "bidirectional": True}}},
        "profile": {"start_step": 0, "num_steps": 2},
    }
    summary = trainer.run(cfg, verbose=False)
    assert np.isfinite(summary["avg_loss"])
    trace_files = glob.glob(os.path.join(
        save, "trace", "plugins", "profile", "*", "*.trace.json.gz"))
    assert trace_files, "no trace captured"
    out = summarize_trace(os.path.join(save, "trace"))
    assert isinstance(out["classes"], dict)
    assert isinstance(out["top_ops"], list)
    # model/data time split logged (reference train.py:44-46 parity)
    metrics = open(os.path.join(save, "metrics.jsonl")).read()
    assert "model_time" in metrics and "data_time" in metrics
