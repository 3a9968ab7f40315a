"""Data-parallel sharded training on a simulated 8-device CPU mesh.

What the reference never had (SURVEY §2.2): these tests check that the
mesh-sharded training step is numerically equivalent to the single-device
step (same loss, same updated params) and that the driver-facing
``dryrun_multichip`` contract holds.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.models import build_model
from speech_tpu.parallel import (make_mesh, make_parallel_train_step,
                                 pad_batch_to_multiple, shard_batch)
from speech_tpu.parallel.mesh import replicated
from speech_tpu.training.trainer import make_optimizer, make_train_step

MODEL_CFG = {
    "class": "CTC",
    "dropout": 0.0,
    "encoder": {
        "conv": [[4, 5, 9, 2]],
        "rnn": {"dim": 16, "layers": 1, "bidirectional": True},
    },
}


class FakePreproc:
    input_dim = 20
    vocab_size = 8


def fake_batch(rng, b, t=30, u=6):
    return {
        "inputs": rng.standard_normal((b, t, 20)).astype(np.float32),
        "input_lengths": np.full((b,), t, np.int32),
        "labels": rng.integers(0, 8, size=(b, u)).astype(np.int32),
        "label_lengths": np.full((b,), u, np.int32),
    }


def _init(model, batch):
    params = model.init(jax.random.PRNGKey(0), batch["inputs"][:1],
                        batch["input_lengths"][:1])["params"]
    return params


def test_parallel_step_matches_single_device():
    assert jax.device_count() >= 8
    rng = np.random.default_rng(0)
    model = build_model(MODEL_CFG, FakePreproc())
    tx = make_optimizer({"learning_rate": 0.01, "momentum": 0.9})
    batch = fake_batch(rng, b=8)
    params = _init(model, batch)
    opt_state = tx.init(params)

    single = make_train_step(model, tx)
    p1, o1, loss1, gn1 = single(jax.device_get(params),
                                jax.device_get(opt_state), batch,
                                jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=8)
    rep = replicated(mesh)
    pstep = make_parallel_train_step(model, tx, mesh)
    p2, o2, loss2, gn2 = pstep(jax.device_put(jax.device_get(params), rep),
                               jax.device_put(jax.device_get(opt_state), rep),
                               shard_batch(batch, mesh), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(float(gn1), float(gn2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_parallel_multiple_steps_converge():
    rng = np.random.default_rng(1)
    model = build_model(MODEL_CFG, FakePreproc())
    tx = make_optimizer({"learning_rate": 0.05, "momentum": 0.9})
    mesh = make_mesh(n_data=8)
    rep = replicated(mesh)
    batch = fake_batch(rng, b=16)
    params = jax.device_put(_init(model, batch), rep)
    opt_state = jax.device_put(tx.init(params), rep)
    pstep = make_parallel_train_step(model, tx, mesh)
    losses = []
    sharded = shard_batch(batch, mesh)
    for i in range(10):
        params, opt_state, loss, _ = pstep(params, opt_state, sharded,
                                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pad_batch_to_multiple():
    rng = np.random.default_rng(2)
    batch = fake_batch(rng, b=5)
    padded = pad_batch_to_multiple(batch, 8)
    assert padded["inputs"].shape[0] == 8
    assert padded["label_lengths"][5:].tolist() == [0, 0, 0]
    np.testing.assert_array_equal(padded["inputs"][:5], batch["inputs"])
    # already-aligned batch is returned unchanged
    same = pad_batch_to_multiple(batch, 5)
    assert same is batch


def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
