"""Mixed-precision (bfloat16 compute) tests.

TPU-first feature with no reference equivalent: the model config key
``dtype: "bfloat16"`` runs encoder/decoder matmuls in bf16 on the MXU while
parameters and the loss lattices stay float32 (ops.ctc/ops.rnnt cast up
before log-softmax). These tests check params remain f32, losses are finite
and close to the f32 result, and gradients flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.models import build_model


class _Spec:
    input_dim = 40
    vocab_size = 10


def _batch(rng, b=2, t=60, u=6):
    # Labels exclude the last two vocab indices (START is vocab-1 and is
    # never a target; the Seq2Seq head has vocab-1 classes).
    return {
        "inputs": rng.standard_normal((b, t, _Spec.input_dim)).astype(np.float32),
        "input_lengths": np.array([t, t - 13], dtype=np.int32),
        "labels": rng.integers(0, _Spec.vocab_size - 2, size=(b, u)).astype(np.int32),
        "label_lengths": np.array([u, u - 2], dtype=np.int32),
    }


def _model_cfg(klass, dtype):
    cfg = {
        "class": klass,
        "dropout": 0.0,
        "dtype": dtype,
        "encoder": {
            "conv": [[4, 5, 9, 2]],
            "rnn": {"dim": 16, "layers": 1, "bidirectional": True},
        },
    }
    if klass in ("Seq2Seq", "Transducer"):
        cfg["decoder"] = {"embedding_dim": 16, "layers": 1}
    return cfg


@pytest.mark.parametrize("klass", ["CTC", "Seq2Seq", "Transducer"])
def test_bf16_loss_close_to_f32(klass):
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    losses = {}
    for dtype in ("float32", "bfloat16"):
        model = build_model(_model_cfg(klass, dtype), _Spec())
        params = model.init(jax.random.PRNGKey(0), batch, method="loss")["params"]
        # Parameters are stored in float32 regardless of compute dtype.
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32
        losses[dtype] = float(model.apply({"params": params}, batch,
                                          method="loss"))
    assert np.isfinite(losses["bfloat16"])
    # bf16 matmuls lose ~3 decimal digits; losses are O(10).
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05 * (
        1.0 + abs(losses["float32"]))


def test_bf16_gradients_finite_and_f32():
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    model = build_model(_model_cfg("CTC", "bfloat16"), _Spec())
    params = model.init(jax.random.PRNGKey(0), batch, method="loss")["params"]

    def loss_fn(p):
        return model.apply({"params": p}, batch, method="loss")

    grads = jax.grad(loss_fn)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(leaf))


def test_loss_impl_config_key():
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    cfg = _model_cfg("CTC", "float32")
    cfg["loss_impl"] = "pure"
    model = build_model(cfg, _Spec())
    assert model.ctc_impl == "pure"
    params = model.init(jax.random.PRNGKey(0), batch, method="loss")["params"]
    assert np.isfinite(float(model.apply({"params": params}, batch,
                                         method="loss")))
