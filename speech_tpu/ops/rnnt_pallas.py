"""Pallas TPU kernels for the RNN-T loss: batched forward-backward + custom VJP.

TPU-native replacement for the reference's external C transducer library
(SURVEY §2.3 N2). Same layout philosophy as ``ctc_pallas``: time is the
Pallas grid, each grid step advances the whole batch's (B, U+1) lattice row
with alpha/beta carried in VMEM scratch across grid steps. The within-row
recurrence

    alpha(t, u) = logaddexp(alpha(t-1, u) + blank(t-1, u),
                            alpha(t, u-1) + emit(t, u-1))

is solved per step by a hand-rolled Hillis-Steele doubling scan over the
label lanes in the log semiring (log2(U) shift+arith passes), the in-kernel
equivalent of the ``lax.associative_scan`` used by the pure-JAX
implementation in ``speech_tpu.ops.rnnt``.

The custom VJP runs the beta recursion in reverse grid order and emits the
two transition posteriors directly:

    d NLL / d blank(t, u)  = -exp(alpha(t,u) + blank(t,u) + beta(t+1,u) - logZ)
    d NLL / d emit(t, u)   = -exp(alpha(t,u) + emit(t,u) + beta(t,u+1) - logZ)

which XLA scatters into class space with one batched one-hot matmul. Inputs
are the log-softmaxed (B, T, U+1, V+1) joint lattice — the same interface the
reference's native TransducerLoss consumes (transducer_model.py:50-51, 76) —
with true per-utterance lengths masking both axes.
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


def _shift_right(rows, k, fill):
    rolled = pltpu.roll(rows, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(lane < k, fill, rolled)


def _shift_left(rows, k, fill):
    rolled = pltpu.roll(rows, rows.shape[1] - k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(lane >= rows.shape[1] - k, fill, rolled)


def _row_scan_fwd(g, h, n_steps):
    """Solve x_u = logaddexp(h_u, x_{u-1} + g_u) over lanes by doubling.

    (g, h) encode the log-affine map x -> logaddexp(h, x + g); composition
    (g1,h1) then (g2,h2) = (g1+g2, logaddexp(h2, h1+g2)). Identity: (0, -inf).
    """
    for i in range(n_steps):
        k = 1 << i
        g_prev = _shift_right(g, k, 0.0)
        h_prev = _shift_right(h, k, _NEG)
        h = jnp.logaddexp(h, h_prev + g)
        g = g + g_prev
    return h


def _row_scan_bwd(g, h, n_steps):
    """Solve y_u = logaddexp(h_u, y_{u+1} + g_u) over lanes (reverse)."""
    for i in range(n_steps):
        k = 1 << i
        g_next = _shift_left(g, k, 0.0)
        h_next = _shift_left(h, k, _NEG)
        h = jnp.logaddexp(h, h_next + g)
        g = g + g_next
    return h


def _alpha_kernel(n_steps, blank_prev_ref, g_ref, active_ref, alpha_out_ref,
                  alpha_buf):
    i = pl.program_id(0)
    g_t = g_ref[0]  # (B, U1): g_u = emit(t, u-1), -inf at u=0
    active = active_ref[0, :, 0:1] > 0

    @pl.when(i == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, g_t.shape, 1)
        a0 = jnp.where(lane == 0, 0.0, _NEG)
        alpha_buf[:, :] = _row_scan_fwd(g_t, jnp.where(lane == 0, a0, _NEG),
                                        n_steps)

    @pl.when(i > 0)
    def _():
        alpha = alpha_buf[:, :]
        a = alpha + blank_prev_ref[0]
        alpha_new = _row_scan_fwd(g_t, a, n_steps)
        alpha_buf[:, :] = jnp.where(active, alpha_new, alpha)

    alpha_out_ref[0] = alpha_buf[:, :]


def _beta_kernel(n_steps, blank_ref, emit_ref, flags_ref, ulen_mask_ref,
                 alpha_ref, logz_ref, gblank_ref, gemit_ref, beta_buf):
    """Reverse grid step: beta row + transition posteriors at time t."""
    at_last = flags_ref[0, :, 0:1] > 0  # t == t_len - 1 (start of recursion)
    valid = flags_ref[0, :, 1:2] > 0    # t < t_len
    u_is_last = ulen_mask_ref[:, :] > 0  # (B, U1): u == label_length

    # beta(t+1, .) carry; before the first valid step it is the virtual
    # beta(T, .) row: 0 at u = U, -inf elsewhere.
    beta_next = jnp.where(at_last,
                          jnp.where(u_is_last, 0.0, _NEG), beta_buf[:, :])

    blank_t = blank_ref[0]
    emit_t = emit_ref[0]
    b = blank_t + beta_next  # h_u of the reverse row recurrence
    beta_t = _row_scan_bwd(emit_t, b, n_steps)
    beta_buf[:, :] = jnp.where(valid, beta_t, beta_next)

    alpha_t = alpha_ref[0]
    logz = logz_ref[:, 0:1]
    gblank = -jnp.exp(alpha_t + blank_t + beta_next - logz)
    gemit = -jnp.exp(alpha_t + emit_t + _shift_left(beta_t, 1, _NEG) - logz)
    gblank_ref[0] = jnp.where(valid, gblank, 0.0)
    gemit_ref[0] = jnp.where(valid, gemit, 0.0)


def _prep(log_probs, logit_lengths, labels, label_lengths, blank):
    """XLA-side gathers: blank and emit planes, masks (time-major)."""
    b, t, u1, c = log_probs.shape
    u = u1 - 1
    if blank is None:
        blank = c - 1
    u1_pad = _round_up(u1, 128)
    lp = log_probs.astype(jnp.float32)

    blank_lp = lp[..., blank]  # (B,T,U1)
    emit = jnp.take_along_axis(
        lp[:, :, :u, :], labels[:, None, :, None], axis=3)[..., 0]  # (B,T,U)
    u_idx = jnp.arange(u)[None, None, :]
    emit = jnp.where(u_idx < label_lengths[:, None, None], emit, _NEG)
    # g plane for the row scan: g_u = emit(t, u-1), -inf at u = 0
    g = jnp.pad(emit, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG)

    pad_u = u1_pad - u1
    blank_lp = jnp.pad(blank_lp, ((0, 0), (0, 0), (0, pad_u)),
                       constant_values=_NEG)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_u)), constant_values=_NEG)
    emit_p = jnp.pad(emit, ((0, 0), (0, 0), (0, pad_u + 1)),
                     constant_values=_NEG)

    blank_tm = jnp.swapaxes(blank_lp, 0, 1)  # (T,B,U1p)
    g_tm = jnp.swapaxes(g, 0, 1)
    emit_tm = jnp.swapaxes(emit_p, 0, 1)

    ts = jnp.arange(t)[:, None]
    active8 = jnp.broadcast_to(
        (ts < logit_lengths[None, :]).astype(jnp.float32)[:, :, None],
        (t, b, 8))
    n_steps = max(1, (u1_pad - 1).bit_length())
    return (lp, blank_tm, g_tm, emit_tm, active8, u1_pad, n_steps, blank)


def _alpha_all(blank_tm, g_tm, active8, n_steps, interpret):
    t, b, u1p = g_tm.shape
    # blank at t-1 for grid step t (step 0 never reads it)
    blank_prev = jnp.concatenate([blank_tm[:1], blank_tm[:-1]], axis=0)
    return pl.pallas_call(
        functools.partial(_alpha_kernel, n_steps),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, u1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, u1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, u1p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, u1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, u1p), jnp.float32)],
        interpret=interpret,
    )(blank_prev, g_tm, active8)


def _nll_from_alpha(alpha, blank_tm, logit_lengths, label_lengths):
    t, b, _ = alpha.shape
    t_last = jnp.maximum(logit_lengths - 1, 0)
    rows = alpha[t_last, jnp.arange(b)]  # (B, U1p)
    a_final = jnp.take_along_axis(rows, label_lengths[:, None], axis=1)[:, 0]
    blank_rows = blank_tm[t_last, jnp.arange(b)]
    b_final = jnp.take_along_axis(blank_rows, label_lengths[:, None],
                                  axis=1)[:, 0]
    return -(a_final + b_final)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rnnt_loss_pallas(log_probs, logit_lengths, labels, label_lengths,
                     blank: int | None = None, interpret: bool = False):
    """Per-utterance RNN-T NLL via the Pallas kernels; drop-in for
    speech_tpu.ops.rnnt.rnnt_loss."""
    loss, _ = _fwd(log_probs, logit_lengths, labels, label_lengths, blank,
                   interpret)
    return loss


def _fwd(log_probs, logit_lengths, labels, label_lengths, blank, interpret):
    (lp, blank_tm, g_tm, emit_tm, active8, u1p, n_steps, blank_) = _prep(
        log_probs, logit_lengths, labels, label_lengths, blank)
    alpha = _alpha_all(blank_tm, g_tm, active8, n_steps, interpret)
    loss = _nll_from_alpha(alpha, blank_tm, logit_lengths, label_lengths)
    return loss, (log_probs, logit_lengths, labels, label_lengths)


def _bwd(blank, interpret, residuals, g_ct):
    log_probs, logit_lengths, labels, label_lengths = residuals
    b, t, u1, c = log_probs.shape
    u = u1 - 1
    (lp, blank_tm, g_tm, emit_tm, active8, u1p, n_steps, blank_) = _prep(
        log_probs, logit_lengths, labels, label_lengths, blank)

    alpha = _alpha_all(blank_tm, g_tm, active8, n_steps, interpret)
    log_z = -_nll_from_alpha(alpha, blank_tm, logit_lengths, label_lengths)

    t_idx = jnp.arange(t)[:, None]
    at_last = t_idx == (logit_lengths[None, :] - 1)
    valid = t_idx < logit_lengths[None, :]
    flags = jnp.stack([at_last, valid], axis=-1).astype(jnp.float32)
    flags8 = jnp.pad(flags, ((0, 0), (0, 0), (0, 6)))  # (T,B,8)

    ulen_mask = (jnp.arange(u1p)[None, :] == label_lengths[:, None]
                 ).astype(jnp.float32)  # (B, U1p)

    rev3 = lambda i: (t - 1 - i, 0, 0)
    gblank, gemit = pl.pallas_call(
        functools.partial(_beta_kernel, n_steps),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, u1p), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, u1p), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 8), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u1p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, u1p), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, u1p), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, u1p), rev3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, u1p), jnp.float32),
            jax.ShapeDtypeStruct((t, b, u1p), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b, u1p), jnp.float32)],
        interpret=interpret,
    )(blank_tm, emit_tm, flags8, ulen_mask, alpha,
      jnp.broadcast_to(log_z[:, None], (b, 128)))

    # Scatter posteriors back to class space.
    gblank = jnp.swapaxes(gblank, 0, 1)[:, :, :u1]  # (B,T,U1)
    gemit = jnp.swapaxes(gemit, 0, 1)[:, :, :u]  # (B,T,U)
    grad = jnp.zeros((b, t, u1, c), jnp.float32)
    grad = grad.at[..., blank_].set(gblank)
    onehot = (labels[:, :, None] == jnp.arange(c)[None, None, :]
              ).astype(jnp.float32)  # (B,U,C)
    grad = grad.at[:, :, :u, :].add(
        jnp.einsum("btu,buc->btuc", gemit, onehot,
                   precision=jax.lax.Precision.HIGHEST))
    grad = grad * g_ct[:, None, None, None]
    return (grad.astype(log_probs.dtype), None, None, None)


rnnt_loss_pallas.defvjp(_fwd, _bwd)
