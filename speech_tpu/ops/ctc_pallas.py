"""Pallas TPU kernels for the CTC loss: batched forward-backward + custom VJP.

TPU-native replacement for warp-ctc (SURVEY §2.3 N1), with the classic
warp-ctc analytic gradient (d NLL / d logits = softmax - gamma) instead of
autodiff through the time scan.

Layout: the sequential dimension (time) is the Pallas grid; each grid step
processes the whole batch's (B, S) lattice row with full VPU sublane
utilization, carrying alpha/beta in VMEM scratch that persists across grid
steps. Emission scores emit[t, b, s] = log_softmax(logits)[b, t, z_b[s]]
(z = blank-interleaved extended labels) are gathered once in XLA — a fused
take_along_axis — and streamed to the kernel as (1, B, S) blocks, so the
kernels contain only the recursions XLA cannot vectorize:

  forward:   alpha_t = lse3(alpha, shift1(alpha), shift2(alpha)*allow) + emit_t
  backward:  beta_t  = lse3(b, shift_l1(b), shift_l2(b)*allow_l2),
             b = beta_{t+1} + emit_{t+1}, emitted as the posterior
             gamma_t(s) = exp(alpha_t + beta_t - logZ)

The class-space gradient is then one batched MXU matmul in XLA:
grad = (softmax - gamma @ onehot(z)) masked to true lengths. True
per-utterance lengths mask both recursions (the reference feeds warp-ctc
batch-max lengths instead, reference ctc_model.py:43-45).

``ctc_loss_pallas`` is a drop-in for ``speech_tpu.ops.ctc.ctc_loss`` (same
per-utterance NLL contract); parity is tested in interpret mode on CPU and
compiled on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_right(rows, k, fill=_NEG):
    """Shift (B, S) rows toward higher lanes by k, filling the head."""
    rolled = pltpu.roll(rows, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(lane < k, fill, rolled)


def _shift_left(rows, k, fill=_NEG):
    # pltpu.roll requires non-negative shifts; left by k == right by (S - k).
    rolled = pltpu.roll(rows, rows.shape[1] - k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(lane >= rows.shape[1] - k, fill, rolled)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, _NEG)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _alpha_kernel(emit_ref, allow_ref, active_ref, alpha_out_ref, alpha_buf):
    """One grid step = one time step over the whole (B, S) lattice row."""
    i = pl.program_id(0)
    emit_t = emit_ref[0]  # (B, S)
    allow = allow_ref[:, :]  # (B, S)
    active = active_ref[0, :, 0:1] > 0  # (B, 1)

    @pl.when(i == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, emit_t.shape, 1)
        has_lab = allow[:, 1:2] > 0.0  # column 1 = "has >= 1 label"
        alpha_buf[:, :] = jnp.where(
            lane == 0, emit_t,
            jnp.where((lane == 1) & has_lab, emit_t, _NEG))

    @pl.when(i > 0)
    def _():
        alpha = alpha_buf[:, :]
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(allow > 0.0, _shift_right(alpha, 2), _NEG)
        alpha_new = _lse3(alpha, a1, a2) + emit_t
        alpha_buf[:, :] = jnp.where(active, alpha_new, alpha)

    alpha_out_ref[0] = alpha_buf[:, :]


def _beta_kernel(emit_next_ref, allow_ref, flags_ref, beta_init_ref,
                 alpha_ref, logz_ref, gamma_out_ref, beta_buf):
    """Reverse grid step: beta recursion + posterior gamma emission."""
    allow = allow_ref[:, :]
    at_last = flags_ref[0, :, 0:1] > 0  # (B,1): t >= t_len - 1
    valid = flags_ref[0, :, 1:2] > 0  # (B,1): t < t_len

    beta_prev = beta_buf[:, :]
    b_emit = beta_prev + emit_next_ref[0]
    b1 = _shift_left(b_emit, 1)
    allow_l2 = _shift_left(allow, 2, fill=0.0) > 0.0
    b2 = jnp.where(allow_l2, _shift_left(b_emit, 2), _NEG)
    beta_rec = _lse3(b_emit, b1, b2)
    beta = jnp.where(at_last, beta_init_ref[:, :], beta_rec)
    beta_buf[:, :] = beta

    gamma = jnp.exp(alpha_ref[0] + beta - logz_ref[:, 0:1])
    gamma_out_ref[0] = jnp.where(valid, gamma, 0.0)


def _build_z(labels: jax.Array, blank: int, s_pad: int) -> jax.Array:
    b, u = labels.shape
    z = jnp.full((b, s_pad), blank, jnp.int32)
    return z.at[:, 1: 2 * u + 1: 2].set(labels.astype(jnp.int32))


def _prep(logits, logit_lengths, labels, label_lengths, blank):
    """XLA-side: log-softmax, emission gather, masks (time-major outputs)."""
    b, t, c = logits.shape
    u = labels.shape[1]
    if blank is None:
        blank = c - 1
    s_pad = _round_up(2 * u + 1, 128)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (B,T,C)
    z = _build_z(labels, blank, s_pad)  # (B,S)
    emit = jnp.take_along_axis(lp, z[:, None, :], axis=2)  # (B,T,S)
    emit = jnp.swapaxes(emit, 0, 1)  # (T,B,S)

    lane = jnp.arange(s_pad)[None, :]
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :s_pad]
    allow = ((lane % 2 == 1) & (lane >= 2) & (z != z_prev2))
    allow = allow.at[:, 1].set(label_lengths > 0)
    allow = allow.astype(jnp.float32)  # (B,S)

    ts = jnp.arange(t)[:, None]
    active = (ts < logit_lengths[None, :]).astype(jnp.float32)  # (T,B)
    active8 = jnp.broadcast_to(active[:, :, None], (t, b, 8))
    return lp, z, emit, allow, active8, s_pad


def _alpha_all(emit, allow, active8, interpret):
    t, b, s_pad = emit.shape
    return pl.pallas_call(
        _alpha_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, s_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s_pad), jnp.float32)],
        interpret=interpret,
    )(emit, allow, active8)


def _loss_from_alpha(alpha_last, label_lengths):
    """(B, S) final alpha row -> (B,) NLL via the last two lattice states."""
    idx_last = 2 * label_lengths
    take = lambda idx: jnp.take_along_axis(alpha_last, idx[:, None],
                                           axis=1)[:, 0]
    a_last = take(idx_last)
    a_prev = jnp.where(label_lengths > 0,
                       take(jnp.maximum(idx_last - 1, 0)), _NEG)
    return -jnp.logaddexp(a_last, a_prev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(logits, logit_lengths, labels, label_lengths,
                    blank: int | None = None, interpret: bool = False):
    """Per-utterance CTC NLL via the Pallas kernels; drop-in for
    speech_tpu.ops.ctc.ctc_loss."""
    loss, _ = _fwd(logits, logit_lengths, labels, label_lengths, blank,
                   interpret)
    return loss


def _fwd(logits, logit_lengths, labels, label_lengths, blank, interpret):
    lp, z, emit, allow, active8, s_pad = _prep(
        logits, logit_lengths, labels, label_lengths, blank)
    alpha = _alpha_all(emit, allow, active8, interpret)
    b = logits.shape[0]
    alpha_last = alpha[jnp.maximum(logit_lengths - 1, 0), jnp.arange(b)]
    loss = _loss_from_alpha(alpha_last, label_lengths)
    return loss, (logits, logit_lengths, labels, label_lengths)


def _bwd(blank, interpret, residuals, g):
    logits, logit_lengths, labels, label_lengths = residuals
    b, t, c = logits.shape
    lp, z, emit, allow, active8, s_pad = _prep(
        logits, logit_lengths, labels, label_lengths, blank)

    alpha = _alpha_all(emit, allow, active8, interpret)  # (T,B,S)
    alpha_last = alpha[jnp.maximum(logit_lengths - 1, 0), jnp.arange(b)]
    log_z = -_loss_from_alpha(alpha_last, label_lengths)  # (B,)

    # beta init row: 0 at states 2L and 2L-1, -inf elsewhere
    lane = jnp.arange(s_pad)[None, :]
    idx_last = 2 * label_lengths[:, None]
    beta_init = jnp.where(
        (lane == idx_last) | ((lane == idx_last - 1)
                              & (label_lengths[:, None] > 0)), 0.0, _NEG)

    # per-step flags for the reverse pass
    t_idx = jnp.arange(t)[:, None]
    at_last = t_idx >= (logit_lengths[None, :] - 1)
    valid = t_idx < logit_lengths[None, :]
    flags = jnp.stack([at_last, valid], axis=-1).astype(jnp.float32)
    flags8 = jnp.pad(flags, ((0, 0), (0, 0), (0, 6)))  # (T,B,8)

    # emit at t+1 (final row clamped; unused because at_last selects init)
    emit_next = jnp.concatenate([emit[1:], emit[-1:]], axis=0)

    rev3 = lambda i: (t - 1 - i, 0, 0)
    gamma = pl.pallas_call(
        _beta_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, s_pad), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 8), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, s_pad), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, s_pad), rev3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s_pad), jnp.float32)],
        interpret=interpret,
    )(emit_next, allow, flags8, beta_init, alpha,
      jnp.broadcast_to(log_z[:, None], (b, 128)))

    # gamma (T,B,S) -> class space with one batched MXU matmul
    onehot = (z[:, :, None] == jnp.arange(c)[None, None, :]
              ).astype(jnp.float32)  # (B,S,C)
    gamma_btc = jnp.einsum("tbs,bsc->btc", gamma, onehot,
                           precision=jax.lax.Precision.HIGHEST)
    mask = (jnp.arange(t)[None, :] < logit_lengths[:, None])[..., None]
    grad = jnp.where(mask, jnp.exp(lp) - gamma_btc, 0.0)
    grad = grad * g[:, None, None]
    return (grad.astype(logits.dtype), None, None, None)


ctc_loss_pallas.defvjp(_fwd, _bwd)
