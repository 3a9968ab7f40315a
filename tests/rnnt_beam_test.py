"""RNN-T beam search vs exhaustive Viterbi oracle on a tiny model."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.decode.rnnt_beam import rnnt_beam_search
from speech_tpu.models import build_model

VOCAB = 3

MODEL_CFG = {
    "class": "Transducer",
    "dropout": 0.0,
    "encoder": {
        "conv": [[4, 5, 9, 2]],
        "rnn": {"dim": 12, "layers": 1, "bidirectional": False},
    },
    "decoder": {"embedding_dim": 12, "layers": 1},
}


class FakePreproc:
    input_dim = 20
    vocab_size = VOCAB


def make_case(seed, b=2, t=13):
    rng = np.random.default_rng(seed)
    model = build_model(MODEL_CFG, FakePreproc())
    batch = {
        "inputs": rng.standard_normal((b, t, 20)).astype(np.float32),
        "input_lengths": np.array([t, t - 4], np.int32)[:b],
        "labels": np.zeros((b, 3), np.int32),
        "label_lengths": np.full((b,), 3, np.int32),
    }
    params = model.init(jax.random.PRNGKey(seed), batch, method="loss")["params"]
    return model, params, batch


def viterbi_path_score(model, params, batch, utt, y):
    """Best single-alignment log-prob of label sequence y for one utterance,
    via max-product DP over the true joint lattice."""
    one = {k: v[utt:utt + 1] for k, v in batch.items()}
    labels = np.zeros((1, max(len(y), 1)), np.int32)
    labels[0, : len(y)] = y
    lattice, out_lens = model.apply({"params": params}, one["inputs"],
                                    one["input_lengths"], jnp.asarray(labels))
    lp = np.asarray(lattice[0], np.float64)  # (T, Upad+1, V+1)
    t_len = int(out_lens[0])
    u = len(y)
    blank = model.blank
    NEG = -np.inf
    alpha = np.full((t_len, u + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for v in range(u + 1):
            stay = alpha[t - 1, v] + lp[t - 1, v, blank] if t > 0 else NEG
            emit = alpha[t, v - 1] + lp[t, v - 1, y[v - 1]] if v > 0 else NEG
            if t == 0 and v == 0:
                continue
            alpha[t, v] = max(stay, emit)
    return alpha[t_len - 1, u] + lp[t_len - 1, u, blank]


@pytest.mark.parametrize("seed", [0, 1, 2])  # tiered in conftest: [0] slow, rest exhaustive
def test_beam_matches_exhaustive_viterbi(seed):
    model, params, batch = make_case(seed)
    preds, scores = rnnt_beam_search(model, params, batch, beam_size=16,
                                     max_expand=3, max_out=12)
    for utt in range(batch["inputs"].shape[0]):
        best_y, best_s = None, -np.inf
        for L in range(0, 4):
            for y in itertools.product(range(VOCAB), repeat=L):
                s = viterbi_path_score(model, params, batch, utt, list(y))
                if s > best_s:
                    best_y, best_s = y, s
        assert tuple(preds[utt]) == best_y, (utt, preds[utt], best_y)
        np.testing.assert_allclose(scores[utt], best_s, rtol=1e-3, atol=1e-3)


def test_beam_improves_on_greedy_score():
    model, params, batch = make_case(5, b=2, t=17)
    preds_beam, scores_beam = rnnt_beam_search(model, params, batch,
                                               beam_size=8, max_expand=2,
                                               max_out=20)
    preds_greedy, scores_greedy = rnnt_beam_search(model, params, batch,
                                                   beam_size=1, max_expand=2,
                                                   max_out=20)
    assert (scores_beam >= scores_greedy - 1e-5).all()
