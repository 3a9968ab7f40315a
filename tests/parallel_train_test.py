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


def _spec(input_dim=13, vocab_size=8):
    class Spec:
        pass

    Spec.input_dim = input_dim
    Spec.vocab_size = vocab_size
    return Spec()


@pytest.mark.parametrize("family", ["Seq2Seq", "Transducer"])
def test_parallel_step_seq2seq_transducer(family):
    """One data-parallel step per non-CTC family on the 8-device mesh.

    Regression test for the round-2 bug: make_parallel_train_step passed only
    a "dropout" rng, so any Seq2Seq config with sample_prob > 0 (all of them)
    crashed with InvalidRngError under parallel.enabled."""
    import jax

    from speech_tpu.models import build_model
    from speech_tpu.parallel import (make_mesh, make_parallel_train_step,
                                     shard_batch)
    from speech_tpu.training.trainer import init_params, make_optimizer

    cfg = {
        "class": family,
        "dropout": 0.1,
        "encoder": {"conv": [[4, 5, 5, 2]],
                    "rnn": {"dim": 16, "layers": 1, "bidirectional": True}},
        "decoder": {"embedding_dim": 16, "sample_prob": 0.4, "layers": 1},
    }
    spec = _spec()
    model = build_model(cfg, spec)
    tx = make_optimizer({"learning_rate": 0.01, "momentum": 0.9})
    params = init_params(model, spec.input_dim, jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    mesh = make_mesh(n_data=4, n_model=1)

    rng = np.random.default_rng(0)
    batch = {
        "inputs": rng.standard_normal((4, 40, spec.input_dim)).astype(np.float32),
        "input_lengths": np.full((4,), 40, np.int32),
        # tokens below end/start indices (vocab-2, vocab-1)
        "labels": rng.integers(0, spec.vocab_size - 2, (4, 6)).astype(np.int32),
        "label_lengths": np.full((4,), 6, np.int32),
    }
    step = make_parallel_train_step(model, tx, mesh, params=params)
    sharded = shard_batch(batch, mesh)
    params, opt_state, loss, grad_norm = step(params, opt_state, sharded,
                                              jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(grad_norm))


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
