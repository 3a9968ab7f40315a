"""Config-driven data-parallel training on the simulated 8-device mesh."""

import json
import os

import numpy as np
import pytest

from speech_tpu.training import trainer


@pytest.mark.slow
def test_parallel_config_trains(tiny_corpus, tmp_path):
    config = {
        "seed": 2017,
        "save_path": str(tmp_path / "run_dp"),
        "data": {"train_set": tiny_corpus["manifest"],
                 "dev_set": tiny_corpus["manifest"],
                 "start_and_end": False, "time_mult": 20, "label_mult": 4,
                 "num_workers": 2},
        "optimizer": {"batch_size": 4, "epochs": 3, "learning_rate": 0.01,
                      "momentum": 0.9},
        "parallel": {"enabled": True, "n_data": 4},
        "model": {
            "class": "CTC",
            "dropout": 0.0,
            "encoder": {"conv": [[8, 5, 31, 2]],
                        "rnn": {"dim": 24, "layers": 1, "bidirectional": True}},
        },
    }
    summary = trainer.run(config, verbose=False)
    assert np.isfinite(summary["best_dev_cer"])
    with open(os.path.join(config["save_path"], "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    losses = [r["value"] for r in recs if r["name"] == "train_loss"]
    assert losses[-1] < losses[0]
    # resume works with sharded states too
    config2 = dict(config)
    config2["optimizer"] = dict(config["optimizer"], epochs=4)
    summary2 = trainer.run(config2, resume=True, verbose=False)
    assert summary2["epochs_run"] == 1


def test_parallel_rejects_indivisible_batch(tiny_corpus, tmp_path):
    config = {
        "seed": 1,
        "save_path": str(tmp_path / "run_bad"),
        "data": {"train_set": tiny_corpus["manifest"],
                 "dev_set": tiny_corpus["manifest"], "start_and_end": False},
        "optimizer": {"batch_size": 3, "epochs": 1, "learning_rate": 0.01},
        "parallel": {"enabled": True, "n_data": 8},
        "model": {
            "class": "CTC", "dropout": 0.0,
            "encoder": {"conv": [[8, 5, 31, 2]],
                        "rnn": {"dim": 8, "layers": 1, "bidirectional": False}},
        },
    }
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        trainer.run(config, verbose=False)
