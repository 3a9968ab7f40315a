"""Tensor-parallel (model-axis) sharding tests on a virtual 2x4 CPU mesh.

TP rules shard GRU gate projections, conv channels, and dense heads over the
``model`` axis via NamedSharding; GSPMD inserts the collectives (SURVEY §2.2
TP row). Correctness = identical loss/params vs the replicated DP-only step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.models import build_model
from speech_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch
from speech_tpu.parallel.mesh import replicated
from speech_tpu.parallel.tp import param_shardings, shard_params
from speech_tpu.training.trainer import make_optimizer


class _Spec:
    input_dim = 40
    vocab_size = 10


CFG = {
    "class": "CTC",
    "dropout": 0.0,
    "loss_impl": "pure",
    "encoder": {
        "conv": [[8, 5, 9, 2]],
        "rnn": {"dim": 16, "layers": 2, "bidirectional": True},
    },
}


def _batch(rng, b=4, t=50, u=6):
    return {
        "inputs": rng.standard_normal((b, t, _Spec.input_dim)).astype(np.float32),
        "input_lengths": np.full((b,), t, np.int32),
        "labels": rng.integers(0, _Spec.vocab_size, (b, u)).astype(np.int32),
        "label_lengths": np.full((b,), u, np.int32),
    }


def test_param_shardings_rules():
    mesh = make_mesh(n_data=2, n_model=4)
    model = build_model(CFG, _Spec())
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch, method="loss")["params"]
    sh = param_shardings(params, mesh)
    gru = sh["enc"]["gru_0"]
    assert gru["fwd_wi"].spec == jax.sharding.PartitionSpec(None, "model")
    assert gru["fwd_bh"].spec == jax.sharding.PartitionSpec("model")
    conv = sh["enc"]["Conv_0"]
    assert conv["kernel"].spec[-1] == "model"
    # vocab+1 = 11 does not divide 4 -> fc head falls back to replication
    assert sh["fc"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_tp_train_step_matches_replicated():
    mesh = make_mesh(n_data=2, n_model=4)
    model = build_model(CFG, _Spec())
    tx = make_optimizer({"learning_rate": 0.05, "momentum": 0.9})
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    params0 = model.init(jax.random.PRNGKey(0), batch, method="loss")["params"]

    # replicated DP-only reference (copy leaves: device_put with an identical
    # sharding aliases buffers, and the donating steps would delete them for
    # the other variant)
    mesh_dp = make_mesh(n_data=2, n_model=1)
    params0 = jax.tree_util.tree_map(lambda x: np.asarray(x), params0)
    p_rep = jax.device_put(params0, replicated(mesh_dp))
    o_rep = tx.init(p_rep)
    step_rep = make_parallel_train_step(model, tx, mesh_dp)
    b_rep = shard_batch(batch, mesh_dp)

    # TP + DP (fresh host copies again, same reason)
    p_tp = shard_params(
        jax.tree_util.tree_map(lambda x: np.array(x, copy=True), params0), mesh)
    o_tp = tx.init(p_tp)
    step_tp = make_parallel_train_step(model, tx, mesh, params=p_tp)
    b_tp = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(7)
    for _ in range(2):
        p_rep, o_rep, loss_rep, gn_rep = step_rep(p_rep, o_rep, b_rep, key)
        p_tp, o_tp, loss_tp, gn_tp = step_tp(p_tp, o_tp, b_tp, key)
    np.testing.assert_allclose(float(loss_tp), float(loss_rep),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(gn_tp), float(gn_rep), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_tp),
                    jax.tree_util.tree_leaves(p_rep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # weights actually live sharded on the model axis
    wi = p_tp["enc"]["gru_0"]["fwd_wi"]
    assert wi.sharding.spec == jax.sharding.PartitionSpec(None, "model")


@pytest.mark.slow
def test_tp_config_trains(tiny_corpus):
    from speech_tpu.training import trainer

    cfg = {
        "seed": 3,
        "save_path": None,
        "data": {"train_set": tiny_corpus["manifest"],
                 "dev_set": tiny_corpus["manifest"],
                 "start_and_end": False, "num_workers": 1},
        "optimizer": {"batch_size": 2, "epochs": 1, "learning_rate": 0.05,
                      "momentum": 0.9},
        "model": {"class": "CTC", "dropout": 0.0, "loss_impl": "pure",
                  "encoder": {"conv": [[4, 5, 9, 2]],
                              "rnn": {"dim": 8, "layers": 1,
                                      "bidirectional": True}}},
        "parallel": {"enabled": True, "n_data": 2, "n_model": 4},
    }
    import tempfile
    cfg["save_path"] = tempfile.mkdtemp(prefix="tp_train_")
    summary = trainer.run(cfg, verbose=False)
    assert np.isfinite(summary["avg_loss"])
