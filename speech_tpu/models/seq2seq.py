"""Attention seq2seq: shared encoder + GRU-cell decoder with input feeding.

Capability parity with the reference ``Seq2Seq`` (reference: speech/models/
seq2seq.py:14-248): embedding + GRUCell decoder (lines 24-25), NNAttention by
default (line 27, configurable to the content/prod variants), scheduled
sampling with a per-step batch-wide draw (lines 93-98), input feeding
``ix = ix + sx`` (100-101), output head over vocab-1 classes — START (the
last vocab index) is never predicted (32-34) — and summed cross-entropy over
end-padded targets divided by batch size (52-64, 229-248).

TPU-first: the per-timestep Python loop (seq2seq.py:92-109) becomes a
``jax.lax.scan`` over the label axis; greedy inference is a fixed-length
scan with an all-ended early-stop mask (the reference breaks out of its
Python loop, 145-178); attention masks padded encoder frames (the reference
attends to padding, degrading batched eval — examples/timit/README.md:56-58).
Decoder state is (hx, align, summary, step) with fixed shapes so the same
step function drives teacher forcing, greedy decoding, and beam search.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_tpu.models import encoder as enc
from speech_tpu.ops import attention as att
from speech_tpu.ops import rnn as rnn_ops


class Seq2SeqModel(nn.Module):
    encoder: enc.EncoderConfig
    input_dim: int
    vocab_size: int  # includes </s> and <s>; START is the LAST index
    embedding_dim: int
    sample_prob: float = 0.0
    log_t: bool = False
    attention_kind: str = "nn"
    attention_kernel: int = 15  # reference NNAttention kernel_size=15
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, input_dim: int, vocab_size: int, model_cfg: dict,
                    dtype=jnp.float32) -> "Seq2SeqModel":
        cfg = enc.EncoderConfig.from_dict(model_cfg["encoder"],
                                          dropout=model_cfg.get("dropout", 0.0))
        dec = model_cfg["decoder"]
        if dec["embedding_dim"] != cfg.rnn_dim:
            # input feeding adds the (rnn_dim) summary to the embedding
            raise ValueError("decoder.embedding_dim must equal encoder rnn dim "
                             "(input feeding adds attention summary to the "
                             "embedded input, reference seq2seq.py:100-101)")
        kind = dec.get("attention", "nn")
        default_k = 15 if kind == "nn" else 11
        return cls(
            encoder=cfg, input_dim=input_dim, vocab_size=vocab_size,
            embedding_dim=dec["embedding_dim"],
            sample_prob=dec.get("sample_prob", 0.0),
            log_t=dec.get("log_t", False),
            attention_kind=kind,
            attention_kernel=dec.get("attention_kernel", default_k),
            dtype=dtype)

    @property
    def start_idx(self) -> int:
        return self.vocab_size - 1  # START placed last (loader.py:39-43)

    @property
    def end_idx(self) -> int:
        return self.vocab_size - 2

    def setup(self):
        cfg = self.encoder
        h = cfg.rnn_dim
        e = self.embedding_dim
        self.enc = enc.Encoder(cfg, dtype=self.dtype)
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0), (self.vocab_size, e))
        scale = 1.0 / math.sqrt(h)
        u = nn.initializers.uniform(scale=2 * scale)
        shifted = lambda key, shape, dtype=jnp.float32: u(key, shape, dtype) - scale
        self.dec_wi = self.param("dec_wi", shifted, (e, 3 * h))
        self.dec_bi = self.param("dec_bi", shifted, (3 * h,))
        self.dec_wh = self.param("dec_wh", shifted, (h, 3 * h))
        self.dec_bh = self.param("dec_bh", shifted, (3 * h,))
        shapes = att.attention_param_shapes(self.attention_kind, h,
                                            self.attention_kernel)
        self.att_params = {
            name: self.param(f"att_{name}", nn.initializers.lecun_normal()
                             if len(shape) > 1 else nn.initializers.zeros,
                             shape)
            for name, shape in shapes.items()
        }
        self.fc_w = self.param("fc_w", nn.initializers.lecun_normal(),
                               (h, self.vocab_size - 1))
        self.fc_b = self.param("fc_b", nn.initializers.zeros,
                               (self.vocab_size - 1,))

    # --- decoder primitives ---

    def _attend(self, eh, dhx, ax, use_ax, mask):
        fn = att.ATTENTION_FNS[self.attention_kind]
        log_t = self.log_t and self.attention_kind != "prod"
        return fn(self.att_params, eh, dhx, ax, use_ax, mask, log_t)

    def _dec_gru(self, hx, ix):
        return rnn_ops.gru_cell_step(hx, ix, self.dec_wi, self.dec_bi,
                                     self.dec_wh, self.dec_bh)

    def init_state(self, eh: jax.Array) -> tuple:
        """Zeroed decoder state (hx, align, summary, step) for a batch."""
        b, t, h = eh.shape
        return (jnp.zeros((b, h), self.dtype), jnp.zeros((b, t), self.dtype),
                jnp.zeros((b, h), self.dtype), jnp.int32(0))

    def decode_step(self, eh: jax.Array, enc_mask: jax.Array, y: jax.Array,
                    state: tuple) -> tuple[jax.Array, tuple]:
        """One decoder step (reference decode_step, seq2seq.py:114-137).

        y: (B,) previous token ids. Returns (logits (B, V-1), new_state).
        """
        hx, ax, sx, t = state
        ix = jnp.take(self.embedding, y, axis=0).astype(self.dtype)
        ix = ix + jnp.where(t > 0, 1.0, 0.0) * sx  # input feeding; sx unused at t=0
        hx = self._dec_gru(hx, ix)
        sx, ax = self._attend(eh, hx, ax, t > 0, enc_mask)
        logits = (hx + sx) @ self.fc_w + self.fc_b
        return logits, (hx, ax, sx, t + 1)

    # --- forward paths ---

    def encode(self, inputs, input_lengths, train=False):
        eh, out_lens = self.enc(inputs, input_lengths, train=train)
        mask = jnp.arange(eh.shape[1])[None, :] < out_lens[:, None]
        return eh, out_lens, mask

    def __call__(self, inputs, input_lengths, labels, train: bool = False):
        """Teacher-forced forward (reference decode, seq2seq.py:78-112).

        labels: (B, U) end-padded, starting with <s>. Returns
        (logits (B, U-1, V-1), alignments (B, U-1, T')).
        """
        eh, _, mask = self.encode(inputs, input_lengths, train=train)
        return self._teacher_forced(eh, mask, labels, train)

    def _teacher_forced(self, eh, mask, labels, train: bool = False):
        """Teacher-forced decode from a precomputed encoding (shared with
        eval_outputs so loss + greedy reuse one encoder forward)."""
        b, u = labels.shape
        teacher = jnp.take(self.embedding, labels[:, :-1], axis=0)

        use_sampling = train and self.sample_prob > 0
        if use_sampling:
            key = self.make_rng("sample")
            # one draw per step for the whole batch (reference seq2seq.py:93-94)
            draws = jax.random.bernoulli(key, self.sample_prob, (u - 1,))
        else:
            draws = jnp.zeros((u - 1,), bool)

        def step(carry, xs):
            state, prev_id = carry
            teacher_ix, draw = xs
            t = state[3]
            sampled_ix = jnp.take(self.embedding, prev_id, axis=0)
            ix_tok = jnp.where(draw & (t > 0), sampled_ix, teacher_ix)
            # inline decode_step with pre-embedded input
            hx, ax, sx, _ = state
            ix = ix_tok.astype(self.dtype) + jnp.where(t > 0, 1.0, 0.0) * sx
            hx = self._dec_gru(hx, ix)
            sx, ax = self._attend(eh, hx, ax, t > 0, mask)
            logits = (hx + sx) @ self.fc_w + self.fc_b
            prev_id = jnp.argmax(logits, axis=-1).astype(labels.dtype)
            return ((hx, ax, sx, t + 1), prev_id), (logits, ax)

        init = (self.init_state(eh), jnp.zeros((b,), labels.dtype))
        xs = (jnp.swapaxes(teacher, 0, 1), draws)
        _, (logits, aligns) = jax.lax.scan(step, init, xs)
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(aligns, 0, 1)

    def end_pad_labels(self, labels: jax.Array, label_lengths: jax.Array
                       ) -> jax.Array:
        """Replace zero-padding with the end token (reference end_pad_concat,
        seq2seq.py:240-248)."""
        u = labels.shape[1]
        pos = jnp.arange(u)[None, :]
        return jnp.where(pos < label_lengths[:, None], labels, self.end_idx)

    def loss(self, batch: dict, train: bool = False) -> jax.Array:
        """Summed cross-entropy over all positions / batch size (reference
        seq2seq.py:52-64; padded positions train the end token, as there)."""
        labels = self.end_pad_labels(batch["labels"], batch["label_lengths"])
        logits, _ = self(batch["inputs"], batch["input_lengths"], labels,
                         train=train)
        targets = labels[:, 1:]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.sum() / labels.shape[0]

    def per_utterance_loss(self, batch: dict) -> jax.Array:
        """(B,) summed cross-entropy per utterance (same padded-position
        convention as ``loss``; used for exact corpus-level dev loss)."""
        labels = self.end_pad_labels(batch["labels"], batch["label_lengths"])
        logits, _ = self(batch["inputs"], batch["input_lengths"], labels,
                         train=False)
        targets = labels[:, 1:]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.sum(axis=1)

    def eval_outputs(self, batch: dict, max_len: int = 200
                     ) -> tuple[jax.Array, jax.Array]:
        """(PER-UTTERANCE losses (B,), greedy tokens) sharing ONE encoder
        forward — the jitted dev-eval program (the reference's eval path
        re-encodes for loss and infer separately, reference train.py:51-70).
        Per-utterance losses let ragged final batches be padded to one
        compiled shape and sliced exactly."""
        eh, _, mask = self.encode(batch["inputs"], batch["input_lengths"],
                                  train=False)
        labels = self.end_pad_labels(batch["labels"], batch["label_lengths"])
        logits, _ = self._teacher_forced(eh, mask, labels, train=False)
        targets = labels[:, 1:]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        ys = self._greedy_from(eh, mask, max_len)
        return nll.sum(axis=1), ys

    def greedy(self, batch: dict, max_len: int = 200) -> jax.Array:
        """Batched greedy inference (reference infer/infer_decode,
        seq2seq.py:139-178). Returns (B, max_len+1) token ids starting with
        <s>; positions after each utterance's </s> are filled with </s>."""
        eh, _, mask = self.encode(batch["inputs"], batch["input_lengths"],
                                  train=False)
        return self._greedy_from(eh, mask, max_len)

    def _greedy_from(self, eh, mask, max_len: int) -> jax.Array:
        b = eh.shape[0]
        y0 = jnp.full((b,), self.start_idx, jnp.int32)

        def step(carry, _):
            state, y, done = carry
            logits, state = self.decode_step(eh, mask, y, state)
            y_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            y_next = jnp.where(done, self.end_idx, y_next)
            done = done | (y_next == self.end_idx)
            return (state, y_next, done), y_next

        init = (self.init_state(eh), y0, jnp.zeros((b,), bool))
        _, ys = jax.lax.scan(step, init, None, length=max_len)
        return jnp.concatenate([y0[:, None], jnp.swapaxes(ys, 0, 1)], axis=1)
