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


def _viterbi_scores_batched(model, params, batch, utt, cands):
    """Best single-alignment log-prob for EVERY candidate label sequence of
    one utterance, from ONE jitted lattice forward over the whole candidate
    batch (the per-candidate eager version made this oracle the slowest test
    in the suite) + a small vectorized numpy DP."""
    n = len(cands)
    u_max = max((len(y) for y in cands), default=0) or 1
    labels = np.zeros((n, u_max), np.int32)
    for i, y in enumerate(cands):
        labels[i, : len(y)] = y
    inputs = np.repeat(batch["inputs"][utt:utt + 1], n, axis=0)
    lens = np.full((n,), batch["input_lengths"][utt], np.int32)
    lattice, out_lens = jax.jit(
        lambda i, l, y: model.apply({"params": params}, i, l, y)
    )(inputs, lens, labels)
    lp = np.asarray(lattice, np.float64)  # (N, T, u_max+1, V+1)
    t_len = int(out_lens[0])
    blank = model.blank
    NEG = -np.inf
    ulen = np.asarray([len(y) for y in cands])
    alpha = np.full((n, t_len, u_max + 1), NEG)
    alpha[:, 0, 0] = 0.0
    for t in range(t_len):
        for v in range(u_max + 1):
            if t == 0 and v == 0:
                continue
            stay = alpha[:, t - 1, v] + lp[:, t - 1, v, blank] if t > 0 \
                else np.full(n, NEG)
            emit = (alpha[:, t, v - 1] + lp[np.arange(n), t, v - 1,
                                            labels[:, v - 1]]) if v > 0 \
                else np.full(n, NEG)
            valid_v = v <= ulen
            alpha[:, t, v] = np.where(valid_v, np.maximum(stay, emit), NEG)
    final = alpha[np.arange(n), t_len - 1, ulen] \
        + lp[np.arange(n), t_len - 1, ulen, blank]
    return final


@pytest.mark.parametrize("seed", [0, 1, 2])  # tiered in conftest: [0] slow, rest exhaustive
def test_beam_matches_exhaustive_viterbi(seed):
    model, params, batch = make_case(seed)
    preds, scores = rnnt_beam_search(model, params, batch, beam_size=16,
                                     max_expand=3, max_out=12)
    cands = [y for L in range(0, 4)
             for y in itertools.product(range(VOCAB), repeat=L)]
    for utt in range(batch["inputs"].shape[0]):
        s = _viterbi_scores_batched(model, params, batch, utt, cands)
        best = int(np.argmax(s))
        best_y, best_s = cands[best], s[best]
        # sanity: the batched oracle reproduces the reference per-candidate DP
        np.testing.assert_allclose(
            s[best], viterbi_path_score(model, params, batch, utt,
                                        list(best_y)), rtol=1e-6)
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
