"""RNN-T (transducer) loss: log-space forward algorithm over the (T, U) lattice.

TPU-native replacement for the reference's external C transducer library
(reference: Makefile:10-12, speech/models/transducer_model.py:46-52 — the
model hands a log-softmaxed (B, T, U+1, V+1) joint lattice to the native
``TransducerLoss``). Recursion (Graves 2012):

    alpha(t, u) = logaddexp(alpha(t-1, u) + blank(t-1, u),
                            alpha(t, u-1) + emit(t, u-1))
    log P(y|x) = alpha(T-1, U) + blank(T-1, U)

The within-row dependency alpha(t, u-1) is a first-order linear recurrence in
the log semiring, evaluated here with ``lax.associative_scan`` over the label
axis (O(log U) depth instead of O(U) sequential) inside a ``lax.scan`` over
time. Autodiff through the scans gives exact gradients; the Pallas kernel in
``rnnt_pallas.py`` implements the fused alpha/beta version with a custom VJP.

True per-utterance lengths mask both axes (the reference claims batch-max
frame lengths for every utterance, transducer_model.py:81-82).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _row_recurrence(g: jax.Array, h: jax.Array) -> jax.Array:
    """Solve x_u = logaddexp(h_u, x_{u-1} + g_u) (x_{-1} = -inf) along the
    last axis via associative scan of log-affine maps (g, h)."""

    def combine(a, b):
        g1, h1 = a
        g2, h2 = b
        return g1 + g2, jnp.logaddexp(h2, h1 + g2)

    _, x = jax.lax.associative_scan(combine, (g, h), axis=-1)
    return x


def rnnt_loss(log_probs: jax.Array, logit_lengths: jax.Array,
              labels: jax.Array, label_lengths: jax.Array,
              blank: int | None = None) -> jax.Array:
    """Per-utterance RNN-T negative log likelihood.

    Args:
      log_probs: (B, T, U+1, V+1) log-softmaxed joint lattice (the interface
        the reference model produces at transducer_model.py:76).
      logit_lengths: (B,) true encoder frame counts.
      labels: (B, U) int labels, padding arbitrary (masked by lengths).
      label_lengths: (B,) true label lengths.
      blank: blank index; defaults to V (LAST, reference transducer_model.py:28-29).

    Returns:
      (B,) float32 negative log likelihoods.
    """
    log_probs = log_probs.astype(jnp.float32)
    b, t, u1, c = log_probs.shape
    u = u1 - 1
    if labels.shape[1] != u:
        raise ValueError(f"labels U={labels.shape[1]} but lattice U+1={u1}")
    if blank is None:
        blank = c - 1

    blank_lp = log_probs[..., blank]  # (B, T, U+1)
    # emit(t, u) = lp[t, u, y[u+1]] for u in 0..U-1; extended with -inf at u=U
    emit = jnp.take_along_axis(
        log_probs[:, :, :u, :], labels[:, None, :, None], axis=3)[..., 0]
    u_idx = jnp.arange(u)[None, None, :]
    emit = jnp.where(u_idx < label_lengths[:, None, None], emit, _NEG_INF)
    emit_ext = jnp.pad(emit, ((0, 0), (0, 0), (0, 1)),
                       constant_values=_NEG_INF)  # (B, T, U+1)

    # g_u for the row recurrence is emit(t, u-1): shift right by one.
    g_all = jnp.pad(emit, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG_INF)

    neg = jnp.float32(_NEG_INF)

    # t = 0 row: A = [0, -inf, ...]
    a0 = jnp.full((b, u1), neg).at[:, 0].set(0.0)
    alpha = _row_recurrence(g_all[:, 0, :], a0)

    def step(alpha_prev, inputs):
        blank_tm1, g_t, t_idx = inputs  # blank at t-1 (stay), emit at t (row)
        a = alpha_prev + blank_tm1
        alpha_new = _row_recurrence(g_t, a)
        active = (t_idx < logit_lengths)[:, None]
        return jnp.where(active, alpha_new, alpha_prev), None

    xs = (jnp.swapaxes(blank_lp[:, :-1, :], 0, 1),
          jnp.swapaxes(g_all[:, 1:, :], 0, 1),
          jnp.arange(1, t))
    alpha, _ = jax.lax.scan(step, alpha, xs)

    # Final: alpha(T'-1, U') + blank(T'-1, U') at true lengths.
    t_last = jnp.maximum(logit_lengths - 1, 0)
    a_final = jnp.take_along_axis(alpha, label_lengths[:, None], axis=1)[:, 0]
    blank_final = blank_lp[jnp.arange(b), t_last, label_lengths]
    return -(a_final + blank_final)


def rnnt_loss_auto(log_probs, logit_lengths, labels, label_lengths,
                   blank: int | None = None, impl: str = "auto") -> jax.Array:
    """Per-utterance RNN-T NLL, dispatching to the Pallas forward-backward
    kernel on TPU and the pure-JAX scan elsewhere."""
    if impl == "auto":
        platform = jax.devices()[0].platform
        impl = "pure" if platform in ("cpu", "gpu") else "pallas"
    if impl == "pallas":
        from speech_tpu.ops.rnnt_pallas import rnnt_loss_pallas

        if blank is None:
            blank = log_probs.shape[-1] - 1
        return rnnt_loss_pallas(log_probs, logit_lengths, labels,
                                label_lengths, blank, False)
    return rnnt_loss(log_probs, logit_lengths, labels, label_lengths, blank)


def rnnt_loss_mean(log_probs, logit_lengths, labels, label_lengths,
                   blank: int | None = None, impl: str = "auto") -> jax.Array:
    """Batch-mean RNN-T loss (training objective; reference's native loss sums)."""
    return rnnt_loss_auto(log_probs, logit_lengths, labels, label_lengths,
                          blank, impl).mean()
