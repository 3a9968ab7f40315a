"""CTC loss: log-space forward algorithm over the blank-interleaved lattice.

TPU-native replacement for the reference's external warp-ctc C++/CUDA library
(reference: Makefile:4-7, speech/models/ctc_model.py:38-39 — unnormalized
logits in, fused softmax inside the loss, blank = LAST class index). This
module is the pure-JAX implementation: a ``lax.scan`` over time carrying the
(B, 2U+1) alpha row in log space, differentiable by autodiff. It is the
correctness reference for the Pallas kernel in ``ctc_pallas.py`` and the
fallback on non-TPU backends.

Unlike the reference — which claims the batch-max length for every utterance
(ctc_model.py:43-45) — true per-utterance ``logit_lengths`` mask the time
recursion exactly, and padded label positions are ignored via
``label_lengths``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative instead of -inf: keeps autodiff NaN-free


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, _NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))
    return out


def ctc_loss(logits: jax.Array, logit_lengths: jax.Array, labels: jax.Array,
             label_lengths: jax.Array, blank: int | None = None) -> jax.Array:
    """Per-utterance CTC negative log likelihood.

    Args:
      logits: (B, T, V+1) unnormalized scores (softmax fused here, matching
        warp-ctc's interface as used by reference ctc_model.py:25-39).
      logit_lengths: (B,) true frame counts after the encoder.
      labels: (B, U) int labels, zero-padded.
      label_lengths: (B,) true label lengths.
      blank: blank class index; defaults to V (LAST index, the reference's
        convention — ctc_model.py:17-18).

    Returns:
      (B,) float32 negative log likelihoods.
    """
    logits = logits.astype(jnp.float32)
    b, t, nclass = logits.shape
    u = labels.shape[1]
    if blank is None:
        blank = nclass - 1
    s = 2 * u + 1

    log_probs = jax.nn.log_softmax(logits, axis=-1)  # (B, T, V+1)

    # Extended label sequence z: blank, y1, blank, y2, ..., blank. (B, S)
    z = jnp.full((b, s), blank, dtype=labels.dtype)
    z = z.at[:, 1::2].set(labels)

    # skip transition allowed into state s: z[s] != blank and z[s] != z[s-2]
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    allow_skip = (z != blank) & (z != z_prev2)  # (B, S); s<2 is False via pad -1? s=0 blank -> False; s=1: z_prev2=-1 -> True!
    allow_skip = allow_skip.at[:, :2].set(False)

    # Emission log-probs per (t, s): gather z over class axis for each step.
    # (B, T, S) materialized once — fine for the pure-JAX path; the Pallas
    # kernel streams this instead.
    emit = jnp.take_along_axis(log_probs, z[:, None, :], axis=2)  # (B,T,S)
    emit = jnp.swapaxes(emit, 0, 1)  # (T, B, S) time-major

    neg = jnp.float32(_NEG_INF)
    alpha0 = jnp.full((b, s), neg)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, emit[0, :, 1], neg))

    def step(alpha, inputs):
        emit_t, t_idx = inputs
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :s]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :s]
        a2 = jnp.where(allow_skip, a2, neg)
        alpha_new = _logaddexp3(alpha, a1, a2) + emit_t
        # Freeze once past each utterance's true length.
        active = (t_idx < logit_lengths)[:, None]
        alpha = jnp.where(active, alpha_new, alpha)
        return alpha, None

    ts = jnp.arange(1, t)
    alpha, _ = jax.lax.scan(step, alpha0, (emit[1:], ts))

    # Final states: S-1 = 2L and S-2 = 2L-1 at the true label length L.
    idx_last = 2 * label_lengths  # (B,)
    take = lambda idx: jnp.take_along_axis(alpha, idx[:, None], axis=1)[:, 0]
    a_last = take(idx_last)
    a_prev = jnp.where(has_label, take(jnp.maximum(idx_last - 1, 0)), neg)
    ll = jnp.logaddexp(a_last, a_prev)
    return -ll


def ctc_loss_auto(logits, logit_lengths, labels, label_lengths,
                  blank: int | None = None, impl: str = "auto") -> jax.Array:
    """Per-utterance CTC NLL, dispatching to the Pallas forward-backward
    kernel on TPU (2x faster than autodiff-through-scan and residual-free)
    and the pure-JAX scan elsewhere. ``impl``: "auto" | "pure" | "pallas"."""
    if impl == "auto":
        platform = jax.devices()[0].platform
        impl = "pure" if platform in ("cpu", "gpu") else "pallas"
    if impl == "pallas":
        from speech_tpu.ops.ctc_pallas import ctc_loss_pallas

        if blank is None:
            blank = logits.shape[-1] - 1
        return ctc_loss_pallas(logits, logit_lengths, labels, label_lengths,
                               blank, False)
    return ctc_loss(logits, logit_lengths, labels, label_lengths, blank)


def ctc_loss_mean(logits, logit_lengths, labels, label_lengths,
                  blank: int | None = None, impl: str = "auto") -> jax.Array:
    """Batch-mean CTC loss (the framework's training objective; the reference
    sums over the batch via warp-ctc — recipes here scale learning rates
    accordingly)."""
    per_utt = ctc_loss_auto(logits, logit_lengths, labels, label_lengths,
                            blank, impl)
    return per_utt.mean()
