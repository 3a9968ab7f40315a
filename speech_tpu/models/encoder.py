"""Shared acoustic encoder: strided VALID conv stack + multi-layer BiGRU.

Capability parity with the reference's ``Model.encode`` (reference: speech/
models/model.py:21-39, 60-79): 2-D convs with per-layer config
``[out_channels, kernel_t, kernel_f, stride]`` where the stride applies to
BOTH time and frequency, ReLU + optional dropout, reshape to
(B, T', F'*C), then a (bi)GRU stack. Bidirectional layer outputs are
concatenated between layers (torch nn.GRU semantics) and the two halves of the
FINAL layer are summed, keeping encoder_dim == rnn dim (model.py:75-77).

TPU-first details: convs run in feature-last layout so XLA tiles them onto the
MXU; the GRU is a ``lax.scan`` with the input projection hoisted into one big
matmul (see speech_tpu.ops.rnn); the backward direction is length-aware so
padding never contaminates valid frames; activations can run in bfloat16 via
``dtype`` while parameters stay float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_tpu.ops import rnn as rnn_ops


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    conv: tuple[tuple[int, int, int, int], ...]  # (out_c, kh, kw, stride)
    rnn_dim: int
    rnn_layers: int
    bidirectional: bool
    dropout: float = 0.0

    @classmethod
    def from_dict(cls, encoder_cfg: dict, dropout: float = 0.0) -> "EncoderConfig":
        """Parse the reference's config layout (encoder.conv / encoder.rnn)."""
        rnn_cfg = encoder_cfg["rnn"]
        return cls(
            conv=tuple(tuple(c) for c in encoder_cfg["conv"]),
            rnn_dim=rnn_cfg["dim"],
            rnn_layers=rnn_cfg["layers"],
            bidirectional=rnn_cfg.get("bidirectional", False),
            dropout=dropout,
        )


def conv_out_size(conv: Sequence[Sequence[int]], n: int, dim: int) -> int:
    """Output length of the conv stack along ``dim`` (0=time, 1=freq) for a
    VALID convolution (reference model.py:44-52)."""
    for layer in conv:
        _, kh, kw, s = layer
        k = kh if dim == 0 else kw
        n = int(math.ceil((n - k + 1) / s))
    return n


def conv_out_lengths(conv: Sequence[Sequence[int]], lengths: jax.Array) -> jax.Array:
    """Vectorized conv_out_size over a batch of true frame counts."""
    lengths = lengths.astype(jnp.int32)
    for layer in conv:
        _, kh, _, s = layer
        lengths = jnp.ceil((lengths - kh + 1) / s).astype(jnp.int32)
    return jnp.maximum(lengths, 0)


class EncoderConv(nn.Module):
    """One VALID conv layer in the MXU-friendly freq-unfold formulation
    (ops/conv.py). Parameter names/shapes match flax ``nn.Conv`` ("kernel"
    (kh, kw, c_in, c_out), "bias" (c_out,)), so checkpoints are identical
    across formulations and the streaming/seq-parallel paths (which build
    convs from the same params) stay interchangeable."""

    features: int
    kernel_size: tuple[int, int]
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from speech_tpu.ops.conv import encoder_conv

        y = encoder_conv(x.astype(self.dtype), kernel.astype(self.dtype),
                         self.stride)
        return y + bias.astype(self.dtype)


class GRULayer(nn.Module):
    """One (optionally bidirectional) GRU layer over a padded batch."""

    features: int
    bidirectional: bool
    dtype: Any = jnp.float32

    def _params(self, name: str, d: int):
        h = self.features
        scale = 1.0 / math.sqrt(h)
        init = nn.initializers.uniform(scale=2 * scale)

        def shifted(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - scale  # U(-1/sqrt(H), 1/sqrt(H))

        return (self.param(f"{name}_wi", shifted, (d, 3 * h)),
                self.param(f"{name}_bi", shifted, (3 * h,)),
                self.param(f"{name}_wh", shifted, (h, 3 * h)),
                self.param(f"{name}_bh", shifted, (3 * h,)))

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        d = x.shape[-1]
        fwd_w = self._params("fwd", d)
        if not self.bidirectional:
            h0 = jnp.zeros((x.shape[0], self.features), dtype=self.dtype)
            return rnn_ops.gru_sequence(x, h0, *fwd_w)
        bwd_w = self._params("bwd", d)
        # Both directions ride one scan (sequential-step latency dominates).
        stacked = tuple(jnp.stack([f, b]) for f, b in zip(fwd_w, bwd_w))
        return rnn_ops.gru_sequence_bidir(x, lengths, *stacked)


class Encoder(nn.Module):
    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False
                 ) -> tuple[jax.Array, jax.Array]:
        """x: (B, T, F) features; lengths: (B,) true frame counts.

        Returns (encoded (B, T', H), out_lengths (B,)).
        """
        cfg = self.config
        x = x.astype(self.dtype)[..., None]  # (B, T, F, 1)
        for i, (out_c, kh, kw, s) in enumerate(cfg.conv):
            x = EncoderConv(out_c, (kh, kw), s, dtype=self.dtype,
                            name=f"Conv_{i}")(x)
            x = nn.relu(x)
            if cfg.dropout > 0:
                x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        out_lengths = conv_out_lengths(cfg.conv, lengths)

        for i in range(cfg.rnn_layers):
            x = GRULayer(cfg.rnn_dim, cfg.bidirectional, dtype=self.dtype,
                         name=f"gru_{i}")(x, out_lengths)
            # torch nn.GRU applies dropout between layers only.
            if cfg.dropout > 0 and i < cfg.rnn_layers - 1:
                x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        if cfg.bidirectional:
            half = x.shape[-1] // 2
            x = x[..., :half] + x[..., half:]  # sum, not concat (model.py:75-77)
        return x, out_lengths
