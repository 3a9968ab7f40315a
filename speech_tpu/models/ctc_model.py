"""CTC model: shared encoder + linear head over vocab+blank.

Capability parity with the reference ``CTC`` (reference: speech/models/
ctc_model.py:13-70): blank is the LAST class index (= output_dim,
ctc_model.py:17-18), the head projects encoder states to ``output_dim + 1``
classes (ctc_model.py:19), and the loss consumes unnormalized logits with the
softmax fused into the loss (ctc_model.py:25-39). Unlike the reference's
collate (which claims batch-max length for every utterance, ctc_model.py:43-45)
the loss here masks with true per-utterance lengths.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_tpu.models import encoder as enc
from speech_tpu.ops.ctc import ctc_loss, ctc_loss_auto, ctc_loss_mean  # noqa: F401 (ctc_loss re-exported)


class CTCModel(nn.Module):
    encoder: enc.EncoderConfig
    input_dim: int
    output_dim: int  # vocabulary size; blank index == output_dim
    dtype: Any = jnp.float32
    ctc_impl: str = "auto"  # "auto" | "pure" | "pallas"

    @classmethod
    def from_config(cls, input_dim: int, vocab_size: int, model_cfg: dict,
                    dtype=jnp.float32, ctc_impl: str = "auto") -> "CTCModel":
        cfg = enc.EncoderConfig.from_dict(model_cfg["encoder"],
                                          dropout=model_cfg.get("dropout", 0.0))
        freq_out = enc.conv_out_size(cfg.conv, input_dim, dim=1)
        if freq_out <= 0:
            raise ValueError("Convolutional output frequency dimension is not positive")
        return cls(encoder=cfg, input_dim=input_dim, output_dim=vocab_size,
                   dtype=dtype, ctc_impl=ctc_impl)

    @property
    def blank(self) -> int:
        return self.output_dim

    def setup(self):
        self.enc = enc.Encoder(self.encoder, dtype=self.dtype)
        self.fc = nn.Dense(self.output_dim + 1, dtype=self.dtype)

    def __call__(self, inputs: jax.Array, input_lengths: jax.Array,
                 train: bool = False) -> tuple[jax.Array, jax.Array]:
        """Returns (logits (B, T', V+1), logit_lengths (B,))."""
        x, out_lengths = self.enc(inputs, input_lengths, train=train)
        return self.fc(x), out_lengths

    def loss(self, batch: dict, train: bool = False) -> jax.Array:
        """Batch-mean CTC loss from a loader batch dict (Pallas kernel on
        TPU, pure-JAX scan elsewhere; see ops.ctc.ctc_loss_auto)."""
        logits, out_lengths = self(batch["inputs"], batch["input_lengths"],
                                   train=train)
        return ctc_loss_mean(logits, out_lengths, batch["labels"],
                             batch["label_lengths"], blank=self.blank,
                             impl=self.ctc_impl)

    def per_utterance_loss(self, batch: dict) -> jax.Array:
        logits, out_lengths = self(batch["inputs"], batch["input_lengths"],
                                   train=False)
        return ctc_loss(logits, out_lengths, batch["labels"],
                        batch["label_lengths"], blank=self.blank)

    def log_probs(self, batch: dict) -> tuple[jax.Array, jax.Array]:
        """Log-softmax outputs for decoding: ((B, T', V+1), lengths)."""
        logits, out_lengths = self(batch["inputs"], batch["input_lengths"],
                                   train=False)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), out_lengths

    def eval_outputs(self, batch: dict) -> tuple[jax.Array, jax.Array, jax.Array]:
        """PER-UTTERANCE losses AND decode inputs from ONE encoder forward
        (dev eval runs both every batch; the reference recomputes the forward
        per use, reference train.py:57-58). Per-utterance losses let ragged
        final batches be padded to one compiled shape and sliced exactly."""
        logits, out_lengths = self(batch["inputs"], batch["input_lengths"],
                                   train=False)
        losses = ctc_loss_auto(logits, out_lengths, batch["labels"],
                               batch["label_lengths"], blank=self.blank,
                               impl=self.ctc_impl)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return losses, lp, out_lengths

    def conv_out_size(self, n: int, dim: int = 0) -> int:
        return enc.conv_out_size(self.encoder.conv, n, dim)
