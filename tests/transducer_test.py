"""Transducer model tests: lattice shapes, loss/grads, prediction-net
step-vs-sequence parity, greedy decode, e2e training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.models import build_model

VOCAB = 8

MODEL_CFG = {
    "class": "Transducer",
    "dropout": 0.0,
    "encoder": {
        "conv": [[4, 5, 9, 2]],
        "rnn": {"dim": 16, "layers": 1, "bidirectional": True},
    },
    "decoder": {"embedding_dim": 16, "layers": 2},
}


class FakePreproc:
    input_dim = 20
    vocab_size = VOCAB


def fake_batch(rng, b=3, t=30, u=5):
    return {
        "inputs": rng.standard_normal((b, t, 20)).astype(np.float32),
        "input_lengths": np.array([t, t - 3, t - 7], np.int32)[:b],
        "labels": rng.integers(0, VOCAB, size=(b, u)).astype(np.int32),
        "label_lengths": np.array([u, u - 1, u - 2], np.int32)[:b],
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(MODEL_CFG, FakePreproc())
    rng = np.random.default_rng(0)
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, method="loss")
    return model, variables["params"], batch


def test_lattice_shapes(model_and_params):
    model, params, batch = model_and_params
    lattice, out_lens = model.apply({"params": params}, batch["inputs"],
                                    batch["input_lengths"], batch["labels"])
    b, u = batch["labels"].shape
    t_out = model.conv_out_size(batch["inputs"].shape[1], 0)
    assert lattice.shape == (b, t_out, u + 1, VOCAB + 1)
    # log-softmax over the class axis
    np.testing.assert_allclose(
        np.asarray(jnp.exp(lattice).sum(-1)), 1.0, rtol=1e-4)


def test_loss_and_grads(model_and_params):
    model, params, batch = model_and_params
    loss = model.apply({"params": params}, batch, method="loss")
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: model.apply({"params": p}, batch, method="loss")
                     )(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)


def test_predict_step_matches_sequence(model_and_params):
    """Incremental prediction-net stepping reproduces the batch unroll
    (the transducer analog of the reference's seq2seq golden parity test)."""
    model, params, batch = model_and_params
    labels = jnp.asarray(batch["labels"])
    seq = model.apply({"params": params}, labels, method="predict_sequence")
    b, u = batch["labels"].shape
    hs, g = model.apply({"params": params}, b, method="predict_init")
    np.testing.assert_allclose(np.asarray(g), np.asarray(seq[:, 0]),
                               rtol=1e-5, atol=1e-6)
    for i in range(u):
        hs, g = model.apply({"params": params}, hs, labels[:, i],
                            method="predict_step")
        np.testing.assert_allclose(np.asarray(g), np.asarray(seq[:, i + 1]),
                                   rtol=1e-4, atol=1e-5)


def test_greedy_decode(model_and_params):
    model, params, batch = model_and_params
    out = model.apply({"params": params}, batch, method="greedy")
    b = batch["labels"].shape[0]
    assert out.shape == (b, 200)
    out = np.asarray(out)
    assert ((out >= 0) & (out <= VOCAB)).all()
    preds = [row[row != VOCAB].tolist() for row in out]
    assert len(preds) == b


@pytest.mark.slow
def test_transducer_trains(tiny_corpus, tmp_path):
    from speech_tpu.training import trainer
    import json, os

    config = {
        "seed": 2017,
        "save_path": str(tmp_path / "run_t"),
        "data": {"train_set": tiny_corpus["manifest"],
                 "dev_set": tiny_corpus["manifest"],
                 "start_and_end": False, "time_mult": 20, "label_mult": 4,
                 "num_workers": 2},
        "optimizer": {"batch_size": 3, "epochs": 3, "learning_rate": 0.01,
                      "momentum": 0.9},
        "model": {
            "class": "Transducer",
            "dropout": 0.0,
            "encoder": {"conv": [[8, 5, 31, 2]],
                        "rnn": {"dim": 24, "layers": 1, "bidirectional": True}},
            "decoder": {"embedding_dim": 24, "layers": 1},
        },
    }
    summary = trainer.run(config, verbose=False)
    with open(os.path.join(config["save_path"], "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    losses = [r["value"] for r in recs if r["name"] == "train_loss"]
    assert losses[-1] < losses[0]
    assert np.isfinite(summary["best_dev_cer"])
