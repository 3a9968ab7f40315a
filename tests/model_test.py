"""Encoder + CTC model shape/loss tests (parity with reference tests/
model_test.py:9-29 and tests/ctc_test.py:9-28, on synthetic batches)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.models import build_model
from speech_tpu.models.encoder import conv_out_size, conv_out_lengths

# Tiny config mirroring the shape of reference tests/shared.py:4-26.
MODEL_CFG = {
    "class": "CTC",
    "dropout": 0.0,
    "encoder": {
        "conv": [[8, 5, 9, 2]],
        "rnn": {"dim": 16, "layers": 1, "bidirectional": False},
    },
}


class FakePreproc:
    input_dim = 40
    vocab_size = 10


def fake_batch(rng, b=3, t=31, f=40, u=5, vocab=10):
    inputs = rng.standard_normal((b, t, f)).astype(np.float32)
    input_lengths = np.array([t, t - 4, t - 9], dtype=np.int32)[:b]
    labels = rng.integers(0, vocab, size=(b, u)).astype(np.int32)
    label_lengths = np.array([u, u - 1, u - 2], dtype=np.int32)[:b]
    return {
        "inputs": inputs,
        "input_lengths": input_lengths,
        "labels": labels,
        "label_lengths": label_lengths,
    }


def test_conv_out_size():
    conv = [[8, 5, 9, 2], [8, 3, 3, 1]]
    # time: (31-5+1)/2 -> ceil(13.5)=14; then 14-3+1=12
    assert conv_out_size(conv, 31, 0) == 12
    lens = conv_out_lengths(conv, jnp.asarray([31, 22]))
    assert lens[0] == 12
    assert conv_out_size(conv, 22, 0) == int(lens[1])


def test_ctc_forward_shapes():
    rng = np.random.default_rng(0)
    model = build_model(MODEL_CFG, FakePreproc())
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["inputs"],
                           batch["input_lengths"])
    logits, out_lens = model.apply(variables, batch["inputs"],
                                   batch["input_lengths"])
    t_out = conv_out_size(MODEL_CFG["encoder"]["conv"], 31, 0)
    assert logits.shape == (3, t_out, FakePreproc.vocab_size + 1)
    assert np.asarray(out_lens).tolist() == [
        conv_out_size(MODEL_CFG["encoder"]["conv"], int(l), 0)
        for l in batch["input_lengths"]
    ]


def test_ctc_loss_runs_and_is_finite():
    rng = np.random.default_rng(1)
    model = build_model(MODEL_CFG, FakePreproc())
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["inputs"],
                           batch["input_lengths"])
    loss = model.apply(variables, batch, method="loss")
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda p: model.apply({"params": p}, batch, method="loss")
    )(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in flat)


def test_ctc_bidirectional_and_dropout():
    cfg = {
        "class": "CTC",
        "dropout": 0.2,
        "encoder": {
            "conv": [[8, 5, 9, 2]],
            "rnn": {"dim": 16, "layers": 2, "bidirectional": True},
        },
    }
    rng = np.random.default_rng(2)
    model = build_model(cfg, FakePreproc())
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["inputs"],
                           batch["input_lengths"])
    # encoder_dim stays rnn dim (summed halves), so head input is 16
    logits, _ = model.apply(variables, batch["inputs"], batch["input_lengths"])
    assert logits.shape[-1] == 11
    # dropout needs an rng in train mode and is stochastic
    l1 = model.apply(variables, batch, True, method="loss",
                     rngs={"dropout": jax.random.PRNGKey(1)})
    l2 = model.apply(variables, batch, True, method="loss",
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert float(l1) != float(l2)


def test_padding_does_not_affect_valid_outputs():
    """Length-aware encoder: growing the pad region must not change valid
    frames' logits (the reference cannot guarantee this; SURVEY §5 quirks)."""
    rng = np.random.default_rng(3)
    cfg = {
        "class": "CTC",
        "dropout": 0.0,
        "encoder": {
            "conv": [[4, 5, 9, 2]],
            "rnn": {"dim": 8, "layers": 1, "bidirectional": True},
        },
    }
    model = build_model(cfg, FakePreproc())
    b, t, f = 2, 25, 40
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    lens = np.array([25, 17], dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), x, lens)
    logits, out_lens = model.apply(variables, x, lens)
    x2 = x.copy()
    x2[1, 17:] = 99.0  # clobber padding
    logits2, _ = model.apply(variables, x2, lens)
    v = int(out_lens[1])
    # conv kernel overlaps the boundary; compare frames strictly inside
    inner = v - 3
    np.testing.assert_allclose(np.asarray(logits2[1, :inner]),
                               np.asarray(logits[1, :inner]), rtol=1e-4,
                               atol=1e-4)
