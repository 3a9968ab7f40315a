"""Streaming inference: chunked featurization, stateful encoder, online decode.

The reference is batch-only — `eval.py` decodes full utterances after the
fact (reference eval.py:12-18). For serving, this module runs the SAME
trained models frame-synchronously over an unbounded audio stream with
bounded state and exact parity with the offline result:

  * :class:`StreamingFeaturizer` — raw samples in, log-spectrogram frames
    out; keeps the sub-window sample remainder between pushes (numerics match
    data.features.log_specgram_np exactly).
  * :class:`StreamingEncoder` — conv stack + unidirectional GRU with carried
    state. Convs are VALID in time, so each push re-uses a (receptive_field -
    stride) tail of feature frames as left context; GRU hidden states carry
    across pushes. Two compiled shapes total (first push, steady state).
  * :class:`StreamingCTC` — greedy CTC over encoded frames with carried
    collapse state (previous non-blank emission survives chunk boundaries).
  * :class:`StreamingTransducer` — frame-synchronous greedy RNN-T with the
    prediction-network state carried across pushes.

Bidirectional encoders cannot stream (the backward direction needs the
future); configs must set ``rnn.bidirectional: false``. Parity tests:
tests/streaming_test.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_tpu.data import features as F
from speech_tpu.models.encoder import EncoderConfig


class StreamingFeaturizer:
    """Incremental features (log-spectrogram or log-mel) with normalization.

    push(samples) consumes int16/float samples and returns (n_frames, dim)
    float32 features identical to the offline featurizer over the stream so
    far. A remainder of < nperseg samples is kept between pushes.

    ``feature_type``/``n_mels`` mirror the Preprocessor's feature options
    (data.preprocessor): "logspec" (reference parity) or "mel" — a
    logmel-trained model streams with ``from_preproc``.
    """

    def __init__(self, sample_rate: int, mean: np.ndarray, std: np.ndarray,
                 feature_type: str = "logspec", n_mels: int = 0):
        self.sample_rate = sample_rate
        self.mean, self.std = np.asarray(mean), np.asarray(std)
        self.nperseg, self.hop = F.stft_params(sample_rate)
        if feature_type not in ("logspec", "mel"):
            raise ValueError(f"unknown feature_type {feature_type!r}; "
                             "have logspec, mel")
        if feature_type == "mel" and n_mels <= 0:
            raise ValueError("feature_type='mel' needs n_mels > 0")
        self.feature_type = feature_type
        self.n_mels = n_mels
        self._dim = n_mels if feature_type == "mel" else self.nperseg // 2 + 1
        self._buf = np.zeros((0,), np.float64)

    @classmethod
    def from_preproc(cls, preproc, sample_rate: int) -> "StreamingFeaturizer":
        """Build from a fitted Preprocessor (stats + feature options travel
        with the checkpoint, utils/io.py)."""
        return cls(sample_rate, preproc.mean, preproc.std,
                   feature_type=getattr(preproc, "feature_type", "logspec"),
                   n_mels=getattr(preproc, "n_mels", 0))

    def reset(self) -> None:
        self._buf = np.zeros((0,), np.float64)

    def push(self, samples: np.ndarray) -> np.ndarray:
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float64)])
        n = self._buf.shape[0]
        if n < self.nperseg:
            return np.zeros((0, self._dim), np.float32)
        if self.feature_type == "mel":
            feats = F.log_mel_np(self._buf, self.sample_rate, self.n_mels)
        else:
            feats = F.log_specgram_np(self._buf, self.sample_rate)
        t = feats.shape[0]
        # keep the samples not yet fully consumed (next frame starts at t*hop)
        self._buf = self._buf[t * self.hop:]
        return ((feats - self.mean) / self.std).astype(np.float32)


class StreamingEncoder:
    """Stateful conv+GRU encoder over feature chunks (unidirectional only).

    Mirrors models.encoder.Encoder exactly for rnn.bidirectional=false:
    VALID convs with stride in time and freq, ReLU, reshape, GRU stack.
    """

    def __init__(self, enc_params: dict, config: EncoderConfig,
                 dtype=jnp.float32):
        if config.bidirectional:
            raise ValueError("bidirectional encoders cannot stream; train "
                             "with rnn.bidirectional=false for streaming")
        self.params = enc_params
        self.config = config
        self.dtype = dtype
        # time receptive field / total stride of the conv stack
        rf, s = 1, 1
        for _, kh, _, stride in config.conv:
            rf += (kh - 1) * s
            s *= stride
        self.receptive_field, self.total_stride = rf, s
        self.context = rf - s  # feature frames of left context per push

    def init_state(self, batch_size: int = 1) -> dict:
        h = self.config.rnn_dim
        return {
            "ctx": np.zeros((batch_size, 0, 0), np.float32),  # set on 1st push
            "gru": jnp.zeros((self.config.rnn_layers, batch_size, h),
                             self.dtype),
            "started": False,
        }

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_chunk(self, x: jax.Array, gru_h: jax.Array):
        """x: (B, L, F) feature rows (context included). Returns
        ((B, L', H) encoded, new gru_h)."""
        from speech_tpu.ops import rnn as rnn_ops

        cfg = self.config
        out = x.astype(self.dtype)[..., None]
        for i, (_, _, _, stride) in enumerate(cfg.conv):
            p = self.params[f"Conv_{i}"]
            out = jax.lax.conv_general_dilated(
                out, p["kernel"].astype(self.dtype), (stride, stride),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = jax.nn.relu(out + p["bias"].astype(self.dtype))
        b, t, f, c = out.shape
        out = out.reshape(b, t, f * c)
        new_h = []
        for i in range(cfg.rnn_layers):
            g = self.params[f"gru_{i}"]
            hs = rnn_ops.gru_sequence(out, gru_h[i], g["fwd_wi"], g["fwd_bi"],
                                      g["fwd_wh"], g["fwd_bh"])
            new_h.append(hs[:, -1])
            out = hs
        return out, jnp.stack(new_h)

    def push(self, state: dict, feats: np.ndarray) -> tuple[dict, np.ndarray]:
        """feats: (B, L, F) new feature frames; L should be a multiple of the
        conv stride product for a steady compiled shape. Returns (state,
        encoded (B, L/stride, H)) — possibly 0 frames while context fills."""
        b = feats.shape[0]
        if not state["started"]:
            x = np.asarray(feats, np.float32)
        else:
            x = np.concatenate([state["ctx"], np.asarray(feats, np.float32)],
                               axis=1)
        l = x.shape[1]
        if l < self.receptive_field:
            new_state = dict(state, ctx=x, started=True)
            return new_state, np.zeros((b, 0, self.config.rnn_dim), np.float32)
        n_out = (l - self.receptive_field) // self.total_stride + 1
        used = n_out * self.total_stride  # rows consumed by emitted outputs
        enc, gru_h = self._encode_chunk(
            jnp.asarray(x[:, : used + self.context]), state["gru"])
        new_state = dict(state, ctx=x[:, used:], gru=gru_h, started=True)
        return new_state, np.asarray(enc, np.float32)


class StreamingCTC:
    """Greedy CTC over streaming encoded frames with carried collapse state."""

    def __init__(self, model, params, enc: StreamingEncoder):
        self.model = model
        self.params = params
        self.enc = enc
        self.blank = model.blank

    def init_state(self, batch_size: int = 1) -> dict:
        return {"enc": self.enc.init_state(batch_size),
                "prev": np.full((batch_size,), self.blank, np.int64)}

    @functools.partial(jax.jit, static_argnums=(0,))
    def _logits(self, enc_frames):
        fc = self.params["fc"]
        return enc_frames @ fc["kernel"] + fc["bias"]

    def push(self, state: dict, feats: np.ndarray
             ) -> tuple[dict, list[list[int]]]:
        """Returns (state, new tokens per stream for this push)."""
        enc_state, enc_frames = self.enc.push(state["enc"], feats)
        b = feats.shape[0]
        prev = state["prev"].copy()
        out: list[list[int]] = [[] for _ in range(b)]
        if enc_frames.shape[1]:
            toks = np.asarray(jnp.argmax(self._logits(jnp.asarray(enc_frames)),
                                         axis=-1))
            for i in range(b):
                for t in toks[i]:
                    if t != self.blank and t != prev[i]:
                        out[i].append(int(t))
                    prev[i] = t
        return {"enc": enc_state, "prev": prev}, out


class StreamingTransducer:
    """Frame-synchronous greedy RNN-T over streaming encoded frames."""

    def __init__(self, model, params, enc: StreamingEncoder,
                 max_symbols_per_frame: int = 3):
        self.model = model
        self.params = params
        self.enc = enc
        self.blank = model.blank
        self.max_symbols = max_symbols_per_frame

    def init_state(self, batch_size: int = 1) -> dict:
        hs, g = self.model.apply({"params": self.params}, batch_size,
                                 method="predict_init")
        return {"enc": self.enc.init_state(batch_size), "hs": hs, "g": g}

    @functools.partial(jax.jit, static_argnums=(0,))
    def _frames_decode(self, enc_frames, hs, g):
        """Greedy over a chunk of frames. Returns (tokens (B, T, K), hs, g)
        with K = max_symbols; blank-padded."""
        b = enc_frames.shape[0]

        def frame(carry, x_t):
            hs, g = carry

            def emit_try(c, _):
                hs, g, emitted, toks, k = c
                logits = self.model.apply({"params": self.params}, x_t, g,
                                          method="joint_step")
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = (tok != self.blank) & (emitted < self.max_symbols)
                new_hs, new_g = self.model.apply({"params": self.params},
                                                 hs, tok, method="predict_step")
                hs = jnp.where(emit[None, :, None], new_hs, hs)
                g = jnp.where(emit[:, None], new_g, g)
                toks = toks.at[:, k].set(jnp.where(emit, tok, self.blank))
                return (hs, g, emitted + emit.astype(jnp.int32), toks, k + 1), None

            toks0 = jnp.full((b, self.max_symbols), self.blank, jnp.int32)
            (hs, g, _, toks, _), _ = jax.lax.scan(
                emit_try, (hs, g, jnp.zeros((b,), jnp.int32), toks0, 0),
                None, length=self.max_symbols)
            return (hs, g), toks

        (hs, g), toks = jax.lax.scan(frame, (hs, g),
                                     jnp.swapaxes(enc_frames, 0, 1))
        return jnp.swapaxes(toks, 0, 1), hs, g

    def push(self, state: dict, feats: np.ndarray
             ) -> tuple[dict, list[list[int]]]:
        enc_state, enc_frames = self.enc.push(state["enc"], feats)
        b = feats.shape[0]
        out: list[list[int]] = [[] for _ in range(b)]
        hs, g = state["hs"], state["g"]
        if enc_frames.shape[1]:
            toks, hs, g = self._frames_decode(jnp.asarray(enc_frames), hs, g)
            toks = np.asarray(toks)
            for i in range(b):
                out[i] = [int(t) for t in toks[i].ravel() if t != self.blank]
        return {"enc": enc_state, "hs": hs, "g": g}, out
