"""Attention variants for the seq2seq decoder (single query step).

Capability parity with the reference's three interchangeable modules
(reference: speech/models/seq2seq.py:250-360):

  * ``nn``      — additive NNAttention (seq2seq.py:331-360): score(t) =
                  Linear(ReLU(eh_t + dhx + Conv1d(prev_align)_t)); the conv
                  lifts the previous alignment to n_channels == hidden dim.
                  This is what the reference Seq2Seq always uses (line 27).
  * ``content`` — dot-product content + 1-channel location conv on the
                  previous alignment (seq2seq.py:250-314).
  * ``prod``    — pure dot-product (seq2seq.py:316-329).

All variants support the ``log_t`` temperature (scores * log(T) pre-softmax,
seq2seq.py:304-306, 353-355) and — an improvement over the reference — mask
padded encoder frames to -inf before the softmax so batch eval does not
attend to padding (the reference README warns its batched eval degrades for
exactly this reason, examples/timit/README.md:56-58).

Functions are pure (params passed explicitly) so they can run inside
``lax.scan`` decoder loops and beam-search bodies.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e30


def _cast_params(params: dict, dtype) -> dict:
    """Compute dtype follows the encoder states (bf16 mixed precision)."""
    return {k: v.astype(dtype) for k, v in params.items()}


def _masked_softmax(scores: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG)
    return jax.nn.softmax(scores, axis=1)


def _summarize(eh: jax.Array, align: jax.Array) -> jax.Array:
    """Weighted sum of encoder states: (B,T,H) x (B,T) -> (B,H)."""
    return jnp.einsum("bth,bt->bh", eh, align)


def _conv1d_same(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """'SAME' 1-D conv: x (B,T,Cin), kernel (K,Cin,Cout) -> (B,T,Cout)."""
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + bias


def nn_attention(params: dict, eh: jax.Array, dhx: jax.Array, ax: jax.Array,
                 use_ax, mask: Optional[jax.Array], log_t: bool
                 ) -> tuple[jax.Array, jax.Array]:
    """Additive attention. eh (B,T,H), dhx (B,H), ax (B,T) prev alignment.

    ``use_ax`` is a (traced) bool: False on the first decoder step, where the
    reference passes ax=None and skips the conv term entirely.
    Returns (summary (B,H), alignment (B,T)).
    """
    params = _cast_params(params, eh.dtype)
    ax = ax.astype(eh.dtype)
    pax = eh + dhx[:, None, :]  # (B,T,H)
    conv_term = _conv1d_same(ax[:, :, None], params["conv_kernel"],
                             params["conv_bias"])  # (B,T,C=H)
    pax = pax + jnp.where(use_ax, 1.0, 0.0) * conv_term
    scores = (jax.nn.relu(pax) @ params["lin_w"])[:, :, 0] + params["lin_b"]
    if log_t:
        scores = math.log(eh.shape[1]) * scores
    align = _masked_softmax(scores, mask)
    return _summarize(eh, align), align


def content_attention(params: dict, eh: jax.Array, dhx: jax.Array,
                      ax: jax.Array, use_ax, mask: Optional[jax.Array],
                      log_t: bool) -> tuple[jax.Array, jax.Array]:
    """Dot-product content + 1-channel location conv (reference Attention)."""
    scores = jnp.einsum("bth,bh->bt", eh, dhx)
    conv_term = _conv1d_same(ax[:, :, None], params["conv_kernel"],
                             params["conv_bias"])[:, :, 0]
    scores = scores + jnp.where(use_ax, 1.0, 0.0) * conv_term
    if log_t:
        scores = math.log(eh.shape[1]) * scores
    align = _masked_softmax(scores, mask)
    return _summarize(eh, align), align


def prod_attention(params: dict, eh: jax.Array, dhx: jax.Array, ax: jax.Array,
                   use_ax, mask: Optional[jax.Array], log_t: bool
                   ) -> tuple[jax.Array, jax.Array]:
    """Pure dot-product attention (reference ProdAttention; no conv, and the
    reference variant has no log_t — honored by passing log_t=False)."""
    del ax, use_ax
    scores = jnp.einsum("bth,bh->bt", eh, dhx)
    if log_t:
        scores = math.log(eh.shape[1]) * scores
    align = _masked_softmax(scores, mask)
    return _summarize(eh, align), align


ATTENTION_FNS = {
    "nn": nn_attention,
    "content": content_attention,
    "prod": prod_attention,
}


def attention_param_shapes(kind: str, hidden: int, kernel_size: int
                           ) -> dict[str, tuple]:
    """Shapes of the attention parameters for ``kind``."""
    if kind == "nn":
        return {
            "conv_kernel": (kernel_size, 1, hidden),
            "conv_bias": (hidden,),
            "lin_w": (hidden, 1),
            "lin_b": (1,),
        }
    if kind == "content":
        return {"conv_kernel": (kernel_size, 1, 1), "conv_bias": (1,)}
    if kind == "prod":
        return {}
    raise ValueError(f"Unknown attention kind {kind!r}")
