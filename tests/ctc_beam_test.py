"""CTC prefix beam search tests: host decoder vs brute-force oracle, device
decoder vs host decoder, LM hook, masking."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from speech_tpu.decode.ctc_beam import decode, ctc_beam_decode
from speech_tpu.decode.ctc_greedy import max_decode


def brute_force_best(lp, blank):
    """Exact best label sequence by enumerating ALL alignments (tiny T only)."""
    t_max, v = lp.shape
    scores: dict[tuple, float] = {}
    for ali in itertools.product(range(v), repeat=t_max):
        label = tuple(max_decode(ali, blank))
        s = sum(lp[t, a] for t, a in enumerate(ali))
        if label in scores:
            m = max(scores[label], s)
            scores[label] = m + np.log(np.exp(scores[label] - m)
                                       + np.exp(s - m))
        else:
            scores[label] = s
    return max(scores.items(), key=lambda kv: kv[1])


def rand_lp(rng, t, v):
    x = rng.standard_normal((t, v))
    return x - np.log(np.exp(x).sum(1, keepdims=True))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_host_decode_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    t, v = 5, 3  # 3^5 = 243 alignments
    lp = rand_lp(rng, t, v)
    blank = v - 1
    label, nll = decode(lp, beam_size=40, blank=blank, is_log=True)
    ref_label, ref_score = brute_force_best(lp, blank)
    assert tuple(label) == ref_label
    np.testing.assert_allclose(nll, -ref_score, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("beam", [1, 2, 4, 8])
def test_device_matches_host(seed, beam):
    rng = np.random.default_rng(100 + seed)
    b, t, v = 3, 12, 5
    lp = np.stack([rand_lp(rng, t, v) for _ in range(b)])
    # skew toward repeats to exercise the merge path
    lp[:, :, 1] += 1.5
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lengths = np.array([t, t - 3, t - 6], np.int32)
    blank = v - 1
    labels, nll = ctc_beam_decode(lp, lengths, beam_size=beam, blank=blank)
    for i in range(b):
        ref_label, ref_nll = decode(lp[i, : lengths[i]], beam_size=beam,
                                    blank=blank, is_log=True)
        assert tuple(labels[i]) == ref_label, (i, labels[i], ref_label)
        np.testing.assert_allclose(nll[i], ref_nll, rtol=1e-4, atol=1e-4)


def test_device_beam_padding_invariant():
    rng = np.random.default_rng(7)
    b, t, v = 2, 10, 4
    lp = np.stack([rand_lp(rng, t, v) for _ in range(b)])
    lengths = np.array([6, 8], np.int32)
    l1, n1 = ctc_beam_decode(lp, lengths, beam_size=4, blank=v - 1)
    lp2 = lp.copy()
    lp2[0, 6:] = 9.9
    lp2[1, 8:] = -9.9
    l2, n2 = ctc_beam_decode(lp2, lengths, beam_size=4, blank=v - 1)
    assert l1 == l2
    np.testing.assert_allclose(n1, n2, rtol=1e-6)


def test_lm_hook():
    """A strong LM prior toward symbol 0 flips the decode."""
    rng = np.random.default_rng(8)
    t, v = 6, 4
    lp = rand_lp(rng, t, v)
    base_label, _ = decode(lp, beam_size=8, blank=v - 1, is_log=True)
    lm = lambda prefix, s: 0.0 if s == 0 else -5.0
    lm_label, _ = decode(lp, beam_size=8, blank=v - 1, is_log=True, lm_score=lm)
    assert all(s == 0 for s in lm_label)
    assert lm_label != base_label or all(s == 0 for s in base_label)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("beam", [2, 4, 8])
def test_device_lm_matches_host_lm(seed, beam):
    """Device beam with a dense bigram table == host beam with the equivalent
    ``lm_score`` hook (host/device parity WITH an LM enabled)."""
    rng = np.random.default_rng(200 + seed)
    b, t, v = 3, 10, 5
    lp = np.stack([rand_lp(rng, t, v) for _ in range(b)])
    lp[:, :, 1] += 1.5  # exercise the repeat/merge path under the LM
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lengths = np.array([t, t - 2, t - 5], np.int32)
    blank = v - 1
    # Dense bigram table: rows = last symbol + 1 (row 0 = empty prefix).
    lm_tab = rng.standard_normal((v + 1, v)).astype(np.float32) * 0.7
    lm = lambda prefix, s: float(lm_tab[(prefix[-1] + 1) if prefix else 0, s])
    labels, nll = ctc_beam_decode(lp, lengths, beam_size=beam, blank=blank,
                                  lm_logp=lm_tab)
    for i in range(b):
        ref_label, ref_nll = decode(lp[i, : lengths[i]], beam_size=beam,
                                    blank=blank, is_log=True, lm_score=lm)
        assert tuple(labels[i]) == ref_label, (i, labels[i], ref_label)
        np.testing.assert_allclose(nll[i], ref_nll, rtol=1e-4, atol=1e-4)


def test_device_lm_prior_flips_decode():
    """A strong device-side LM prior toward symbol 0 flips the decode (same
    contract as the host test_lm_hook)."""
    rng = np.random.default_rng(11)
    b, t, v = 2, 8, 4
    lp = np.stack([rand_lp(rng, t, v) for _ in range(b)])
    lengths = np.array([t, t], np.int32)
    lm_tab = np.full((v + 1, v), -5.0, np.float32)
    lm_tab[:, 0] = 0.0
    labels, _ = ctc_beam_decode(lp, lengths, beam_size=8, blank=v - 1,
                                lm_logp=lm_tab)
    for lab in labels:
        assert all(s == 0 for s in lab)


def test_probs_interface():
    """Reference-compatible non-log posterior input (ctc_decoder.py:38-44)."""
    rng = np.random.default_rng(9)
    t, v = 8, 5
    probs = rng.random((t, v))
    probs = probs / probs.sum(1, keepdims=True)
    label, nll = decode(probs, beam_size=4, blank=v - 1)
    label2, nll2 = decode(np.log(probs), beam_size=4, blank=v - 1, is_log=True)
    assert label == label2
    np.testing.assert_allclose(nll, nll2, rtol=1e-6)
