"""Streaming inference parity: chunked push results == offline results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.data import features as F
from speech_tpu.decode import ctc_greedy_decode
from speech_tpu.decode.streaming import (
    StreamingCTC, StreamingEncoder, StreamingFeaturizer, StreamingTransducer)
from speech_tpu.models import build_model
from speech_tpu.models.encoder import EncoderConfig


class _Spec:
    input_dim = 40
    vocab_size = 8


UNI_ENC = {
    "conv": [[4, 5, 9, 2]],
    "rnn": {"dim": 16, "layers": 2, "bidirectional": False},
}


def _ctc_model():
    cfg = {"class": "CTC", "dropout": 0.0, "loss_impl": "pure",
           "encoder": UNI_ENC}
    return build_model(cfg, _Spec())


def test_streaming_featurizer_matches_offline():
    rng = np.random.default_rng(0)
    sr = 16000
    samples = (rng.standard_normal(sr) * 3000).astype(np.int16)
    mean = np.zeros(F.feature_dim(sr)); std = np.ones(F.feature_dim(sr))
    offline = F.log_specgram_np(samples, sr)

    sf = StreamingFeaturizer(sr, mean, std)
    chunks = []
    for start in range(0, len(samples), 1234):
        chunks.append(sf.push(samples[start:start + 1234]))
    streamed = np.concatenate([c for c in chunks if c.size], axis=0)
    assert streamed.shape[0] >= offline.shape[0] - 1
    np.testing.assert_allclose(streamed[: offline.shape[0]], offline,
                               rtol=1e-5, atol=1e-5)


def test_streaming_featurizer_logmel_matches_offline():
    """A logmel config streams with exact offline parity (feature_type
    branch + from_preproc plumbing)."""
    rng = np.random.default_rng(5)
    sr, n_mels = 16000, 24
    samples = (rng.standard_normal(sr) * 3000).astype(np.int16)
    offline = F.log_mel_np(samples, sr, n_mels)
    mean, std = offline.mean(0), offline.std(0) + 1e-6

    class _Pre:  # fitted-preprocessor stand-in (stats + feature options)
        feature_type = "mel"
        pass

    pre = _Pre(); pre.n_mels = n_mels; pre.mean = mean; pre.std = std
    sf = StreamingFeaturizer.from_preproc(pre, sr)
    chunks = []
    for start in range(0, len(samples), 1111):
        chunks.append(sf.push(samples[start:start + 1111]))
    streamed = np.concatenate([c for c in chunks if c.size], axis=0)
    assert streamed.shape[1] == n_mels
    assert streamed.shape[0] >= offline.shape[0] - 1
    np.testing.assert_allclose(streamed[: offline.shape[0]],
                               (offline - mean) / std, rtol=1e-4, atol=1e-4)


def test_streaming_featurizer_rejects_bad_config():
    with pytest.raises(ValueError, match="n_mels"):
        StreamingFeaturizer(16000, 0.0, 1.0, feature_type="mel")
    with pytest.raises(ValueError, match="feature_type"):
        StreamingFeaturizer(16000, 0.0, 1.0, feature_type="mfcc")


def test_streaming_encoder_matches_offline():
    model = _ctc_model()
    rng = np.random.default_rng(1)
    b, t = 2, 96
    feats = rng.standard_normal((b, t, _Spec.input_dim)).astype(np.float32)
    lens = np.full((b,), t, np.int32)
    params = model.init(jax.random.PRNGKey(0),
                        {"inputs": feats, "input_lengths": lens,
                         "labels": np.zeros((b, 4), np.int32),
                         "label_lengths": np.full((b,), 4, np.int32)},
                        method="loss")["params"]
    offline, out_lens = model.apply(
        {"params": params}, feats, lens, method="__call__")
    # offline __call__ returns logits; compare pre-fc encoder output instead
    enc_cfg = EncoderConfig.from_dict(UNI_ENC)
    senc = StreamingEncoder(params["enc"], enc_cfg)
    state = senc.init_state(b)
    outs = []
    for start in range(0, t, 16):
        state, enc = senc.push(state, feats[:, start:start + 16])
        if enc.shape[1]:
            outs.append(enc)
    streamed = np.concatenate(outs, axis=1)

    from speech_tpu.models.encoder import Encoder
    enc_mod = Encoder(enc_cfg)
    ref, ref_lens = enc_mod.apply({"params": {
        k: v for k, v in params["enc"].items()}}, jnp.asarray(feats),
        jnp.asarray(lens))
    assert streamed.shape[1] == int(ref_lens[0])
    np.testing.assert_allclose(streamed, np.asarray(ref)[:, :streamed.shape[1]],
                               rtol=2e-5, atol=2e-5)


def test_streaming_ctc_matches_offline_greedy():
    model = _ctc_model()
    rng = np.random.default_rng(2)
    b, t = 2, 128
    feats = rng.standard_normal((b, t, _Spec.input_dim)).astype(np.float32)
    lens = np.full((b,), t, np.int32)
    batch = {"inputs": feats, "input_lengths": lens,
             "labels": np.zeros((b, 4), np.int32),
             "label_lengths": np.full((b,), 4, np.int32)}
    params = model.init(jax.random.PRNGKey(3), batch, method="loss")["params"]
    log_probs, out_lens = model.apply({"params": params}, batch,
                                      method="log_probs")
    offline = ctc_greedy_decode(log_probs, out_lens, blank=model.blank)

    enc_cfg = EncoderConfig.from_dict(UNI_ENC)
    sctc = StreamingCTC(model, params, StreamingEncoder(params["enc"], enc_cfg))
    state = sctc.init_state(b)
    streamed = [[] for _ in range(b)]
    for start in range(0, t, 32):
        state, toks = sctc.push(state, feats[:, start:start + 32])
        for i in range(b):
            streamed[i].extend(toks[i])
    # streaming sees ~receptive-field fewer trailing frames than the padded
    # offline pass; offline decode over those frames could only extend the
    # sequence, so streaming must be a prefix of offline
    for i in range(b):
        assert streamed[i] == offline[i][: len(streamed[i])]
        assert len(offline[i]) - len(streamed[i]) <= 2


def test_streaming_transducer_matches_offline_greedy():
    cfg = {"class": "Transducer", "dropout": 0.0, "loss_impl": "pure",
           "encoder": UNI_ENC, "decoder": {"embedding_dim": 16, "layers": 1}}
    model = build_model(cfg, _Spec())
    rng = np.random.default_rng(4)
    b, t = 2, 96
    feats = rng.standard_normal((b, t, _Spec.input_dim)).astype(np.float32)
    lens = np.full((b,), t, np.int32)
    batch = {"inputs": feats, "input_lengths": lens,
             "labels": np.zeros((b, 4), np.int32),
             "label_lengths": np.full((b,), 4, np.int32)}
    params = model.init(jax.random.PRNGKey(5), batch, method="loss")["params"]
    out = np.asarray(model.apply({"params": params}, batch, method="greedy"))
    offline = [[int(x) for x in row if x != model.blank] for row in out]

    enc_cfg = EncoderConfig.from_dict(UNI_ENC)
    st = StreamingTransducer(model, params,
                             StreamingEncoder(params["enc"], enc_cfg))
    state = st.init_state(b)
    streamed = [[] for _ in range(b)]
    for start in range(0, t, 24):
        state, toks = st.push(state, feats[:, start:start + 24])
        for i in range(b):
            streamed[i].extend(toks[i])
    for i in range(b):
        assert streamed[i] == offline[i][: len(streamed[i])]
        assert len(offline[i]) - len(streamed[i]) <= 3


def test_streaming_rejects_bidirectional():
    enc_cfg = EncoderConfig.from_dict(
        {"conv": [[4, 5, 9, 2]],
         "rnn": {"dim": 16, "layers": 1, "bidirectional": True}})
    with pytest.raises(ValueError, match="stream"):
        StreamingEncoder({}, enc_cfg)
