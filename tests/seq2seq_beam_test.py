"""Seq2Seq batched beam search vs exhaustive oracle on a tiny vocab."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.decode.seq2seq_beam import seq2seq_beam_search
from speech_tpu.models import build_model

VOCAB = 6  # 0..3 symbols, 4 = </s>, 5 = <s>
START, END = 5, 4

MODEL_CFG = {
    "class": "Seq2Seq",
    "dropout": 0.0,
    "encoder": {
        "conv": [[4, 5, 9, 2]],
        "rnn": {"dim": 12, "layers": 1, "bidirectional": False},
    },
    "decoder": {"embedding_dim": 12, "sample_prob": 0.0, "log_t": False},
}


class FakePreproc:
    input_dim = 20
    vocab_size = VOCAB


def make_case(seed, b=2, t=20):
    rng = np.random.default_rng(seed)
    model = build_model(MODEL_CFG, FakePreproc())
    batch = {
        "inputs": rng.standard_normal((b, t, 20)).astype(np.float32),
        "input_lengths": np.array([t, t - 4], np.int32)[:b],
        "labels": np.zeros((b, 4), np.int32),
        "label_lengths": np.full((b,), 4, np.int32),
    }
    params = model.init(jax.random.PRNGKey(seed), batch, method="loss")["params"]
    return model, params, batch


def chain_score(model, params, batch, utt, seq):
    """Score P(seq + </s> | x_utt) by stepping the decoder."""
    one = {k: v[utt:utt + 1] for k, v in batch.items()}
    eh, _, mask = model.apply({"params": params}, one["inputs"],
                              one["input_lengths"], method="encode")
    state = model.apply({"params": params}, eh, method="init_state")
    score = 0.0
    y = jnp.asarray([START], jnp.int32)
    for tok in list(seq) + [END]:
        logits, state = model.apply({"params": params}, eh, mask, y, state,
                                    method="decode_step")
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        score += float(logp[0, tok])
        y = jnp.asarray([tok], jnp.int32)
    return score


@pytest.mark.parametrize("seed", [0, 1, 2])  # tiered in conftest: [0] slow, rest exhaustive
def test_beam_matches_exhaustive(seed):
    model, params, batch = make_case(seed)
    max_len = 4
    out, scores = seq2seq_beam_search(model, params, batch, beam_size=64,
                                      max_len=max_len)
    for utt in range(batch["inputs"].shape[0]):
        # enumerate all sequences of non-end symbols with length < max_len
        best_seq, best_score = None, -np.inf
        for L in range(0, max_len):
            for seq in itertools.product(range(VOCAB - 2), repeat=L):
                s = chain_score(model, params, batch, utt, seq)
                if s > best_score:
                    best_seq, best_score = seq, s
        toks = out[utt].tolist()
        assert toks[0] == START
        hyp = []
        for tok in toks[1:]:
            if tok == END:
                break
            hyp.append(tok)
        assert tuple(hyp) == best_seq, (utt, hyp, best_seq)
        np.testing.assert_allclose(scores[utt], best_score, rtol=1e-4,
                                   atol=1e-4)


def test_beam1_matches_greedy():
    model, params, batch = make_case(7)
    out, _ = seq2seq_beam_search(model, params, batch, beam_size=1, max_len=20)
    greedy = np.asarray(model.apply({"params": params}, batch, 20,
                                    method="greedy"))
    # same decisions step by step until end token
    for utt in range(out.shape[0]):
        a, g = out[utt].tolist(), greedy[utt].tolist()
        a = a[: a.index(END) + 1 if END in a else len(a)]
        g = g[: g.index(END) + 1 if END in g else len(g)]
        assert a == g
