"""Seq2Seq tests: shapes, step-vs-batch golden parity (the reference's key
decoder-correctness pattern, tests/seq2seq_test.py:35-45), attention variants,
loss/grads, greedy inference, and end-to-end training."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.models import build_model
from speech_tpu.models.seq2seq import Seq2SeqModel

VOCAB = 10  # ids 0..7 symbols, 8 = </s>, 9 = <s>
START, END = 9, 8

MODEL_CFG = {
    "class": "Seq2Seq",
    "dropout": 0.0,
    "encoder": {
        "conv": [[4, 5, 9, 2]],
        "rnn": {"dim": 16, "layers": 1, "bidirectional": True},
    },
    "decoder": {"embedding_dim": 16, "sample_prob": 0.0, "log_t": False},
}


class FakePreproc:
    input_dim = 20
    vocab_size = VOCAB


def fake_batch(rng, b=3, t=30, u=6):
    labels = rng.integers(0, VOCAB - 2, size=(b, u)).astype(np.int32)
    labels[:, 0] = START
    labels[:, -1] = END
    return {
        "inputs": rng.standard_normal((b, t, 20)).astype(np.float32),
        "input_lengths": np.array([t, t - 3, t - 7], np.int32)[:b],
        "labels": labels,
        "label_lengths": np.full((b,), u, np.int32),
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(MODEL_CFG, FakePreproc())
    rng = np.random.default_rng(0)
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["inputs"],
                           batch["input_lengths"], batch["labels"])
    return model, variables["params"], batch


def test_forward_shapes(model_and_params):
    model, params, batch = model_and_params
    logits, aligns = model.apply({"params": params}, batch["inputs"],
                                 batch["input_lengths"], batch["labels"])
    b, u = batch["labels"].shape
    assert logits.shape == (b, u - 1, VOCAB - 1)
    t_out = model.conv_out_len if hasattr(model, "conv_out_len") else aligns.shape[2]
    assert aligns.shape == (b, u - 1, t_out)
    # alignments are normalized over encoder time
    np.testing.assert_allclose(np.asarray(aligns.sum(-1)), 1.0, rtol=1e-5)


def test_step_matches_batch_decode(model_and_params):
    """Golden parity: stepwise decode_step reproduces the teacher-forced scan
    (reference tests/seq2seq_test.py:35-45)."""
    model, params, batch = model_and_params
    logits, _ = model.apply({"params": params}, batch["inputs"],
                            batch["input_lengths"], batch["labels"])

    eh, out_lens, mask = model.apply({"params": params}, batch["inputs"],
                                     batch["input_lengths"], method="encode")
    state = model.apply({"params": params}, eh, method="init_state")
    u = batch["labels"].shape[1]
    step_logits = []
    for t in range(u - 1):
        y = jnp.asarray(batch["labels"][:, t])
        lg, state = model.apply({"params": params}, eh, mask, y, state,
                                method="decode_step")
        step_logits.append(np.asarray(lg))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(logits), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("kind,log_t", [("prod", False), ("content", True),
                                        ("nn", True)])
def test_attention_variants(kind, log_t):
    cfg = copy.deepcopy(MODEL_CFG)
    cfg["decoder"]["attention"] = kind
    cfg["decoder"]["log_t"] = log_t
    model = build_model(cfg, FakePreproc())
    rng = np.random.default_rng(1)
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["inputs"],
                           batch["input_lengths"], batch["labels"])
    loss = model.apply(variables, batch, method="loss")
    assert np.isfinite(float(loss))


def test_loss_and_grads(model_and_params):
    model, params, batch = model_and_params
    loss = model.apply({"params": params}, batch, method="loss")
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: model.apply({"params": p}, batch, method="loss")
                     )(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)


def test_scheduled_sampling_draws():
    cfg = copy.deepcopy(MODEL_CFG)
    cfg["decoder"]["sample_prob"] = 0.5
    model = build_model(cfg, FakePreproc())
    rng = np.random.default_rng(2)
    batch = fake_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["inputs"],
                           batch["input_lengths"], batch["labels"])
    # train mode requires the "sample" rng and is stochastic across keys
    l1 = model.apply(variables, batch, True, method="loss",
                     rngs={"sample": jax.random.PRNGKey(1)})
    l2 = model.apply(variables, batch, True, method="loss",
                     rngs={"sample": jax.random.PRNGKey(4)})
    assert float(l1) != float(l2)
    # eval mode has no sampling and needs no rng
    l3 = model.apply(variables, batch, method="loss")
    assert np.isfinite(float(l3))


def test_greedy_infer_shape(model_and_params):
    model, params, batch = model_and_params
    ys = model.apply({"params": params}, batch, 20, method="greedy")
    b = batch["labels"].shape[0]
    assert ys.shape == (b, 21)
    assert (np.asarray(ys)[:, 0] == START).all()


def test_embedding_dim_mismatch_rejected():
    cfg = copy.deepcopy(MODEL_CFG)
    cfg["decoder"]["embedding_dim"] = 8
    with pytest.raises(ValueError):
        build_model(cfg, FakePreproc())


def test_padding_invariance(model_and_params):
    """Masked attention: clobbering padded encoder frames must not change the
    loss (the reference degrades here, examples/timit/README.md:56-58)."""
    model, params, batch = model_and_params
    loss1 = float(model.apply({"params": params}, batch, method="loss"))
    batch2 = dict(batch)
    inputs2 = batch["inputs"].copy()
    inputs2[2, 23:] = 77.0  # beyond utterance 2's true length
    batch2["inputs"] = inputs2
    loss2 = float(model.apply({"params": params}, batch2, method="loss"))
    np.testing.assert_allclose(loss1, loss2, rtol=2e-3)
