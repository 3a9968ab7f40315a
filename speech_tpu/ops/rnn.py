"""GRU recurrences as ``lax.scan`` with MXU-friendly batched matmuls.

The reference encoder's recurrence is cuDNN ``nn.GRU`` (reference: speech/
models/model.py:35-39). On TPU the idiomatic form is: one large matmul
projecting the whole sequence's inputs to gate space up front (MXU, (B*T, in)
x (in, 3H)), then a ``lax.scan`` over time whose per-step work is a single
(B, H) x (H, 3H) matmul plus VPU gate math. Gate conventions follow torch's
GRUCell (r, z, n with the candidate using r * (W_hn h + b_hn)) so correctness
tests can compare against torch directly.

Sequences are padded; the backward direction uses a length-aware reversal so
the reverse pass starts at each utterance's true last frame (the reference
runs cuDNN over padding — masking here is strictly better, SURVEY §5 quirks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reverse_sequences(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each (T, ...) row of a padded batch within its true length.

    x: (B, T, ...), lengths: (B,) ints. Elements at positions >= length stay
    in place (they are padding in both orientations).
    """
    b, t = x.shape[0], x.shape[1]
    pos = jnp.arange(t)[None, :]  # (1, T)
    lens = lengths[:, None]
    rev = jnp.where(pos < lens, lens - 1 - pos, pos)  # (B, T)
    return jnp.take_along_axis(x, rev.reshape(rev.shape + (1,) * (x.ndim - 2)), axis=1)


def _resolve_impl(impl: str, n_rows: int, hidden: int, dtype) -> str:
    """'auto' -> Pallas on TPU for Mosaic-friendly shapes, scan elsewhere."""
    if impl != "auto":
        return impl
    from speech_tpu.ops.gru_pallas import pallas_eligible

    platform = jax.devices()[0].platform
    if platform == "tpu" and pallas_eligible(n_rows, hidden, dtype):
        return "pallas"
    return "pure"


def gru_sequence(x: jax.Array, h0: jax.Array, wi: jax.Array, bi: jax.Array,
                 wh: jax.Array, bh: jax.Array, unroll: int = 4,
                 impl: str = "auto") -> jax.Array:
    """Run a GRU over a padded sequence batch.

    Args:
      x: (B, T, D) inputs.
      h0: (B, H) initial hidden state.
      wi: (D, 3H) input projection, gate order (r, z, n).
      bi: (3H,) input bias.
      wh: (H, 3H) recurrent projection.
      bh: (3H,) recurrent bias.

    Returns:
      (B, T, H) hidden states for every step.
    """
    # Compute dtype follows the inputs (bf16 activations keep bf16 matmuls on
    # the MXU even when the stored parameters are float32).
    wi, bi, wh, bh = (w.astype(x.dtype) for w in (wi, bi, wh, bh))
    h0 = h0.astype(x.dtype)
    # One big MXU matmul for all timesteps.
    x_proj = x @ wi + bi  # (B, T, 3H)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H) time-major for scan

    if _resolve_impl(impl, x.shape[0], wh.shape[0], x.dtype) == "pallas":
        from speech_tpu.ops.gru_pallas import gru_seq_pallas

        hs = gru_seq_pallas(x_proj, h0, wh[None], bh[None], 1)
        return jnp.swapaxes(hs, 0, 1)

    def step(h, xp):
        hp = h @ wh + bh  # (B, 3H)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, x_proj, unroll=unroll)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


def gru_sequence_bidir(x: jax.Array, lengths: jax.Array, wi: jax.Array,
                       bi: jax.Array, wh: jax.Array, bh: jax.Array,
                       unroll: int = 4, impl: str = "auto") -> jax.Array:
    """Both GRU directions in ONE ``lax.scan`` (TPU: the scan's sequential
    step latency dominates a small recurrent matmul, so running fwd and bwd
    as a direction-batched einsum halves the number of sequential steps
    compared with two separate scans).

    Args:
      x: (B, T, D) inputs (padded).
      lengths: (B,) true lengths; the backward direction runs over the
        length-aware reversal so it starts at each utterance's last frame.
      wi/bi/wh/bh: direction-stacked weights — wi (2, D, 3H), bi (2, 3H),
        wh (2, H, 3H), bh (2, 3H); index 0 = forward, 1 = backward.

    Returns:
      (B, T, 2H): [forward ‖ re-reversed backward] concatenated.
    """
    wi, bi, wh, bh = (w.astype(x.dtype) for w in (wi, bi, wh, bh))
    b = x.shape[0]
    h_dim = wh.shape[1]
    x_rev = reverse_sequences(x, lengths)
    xs = jnp.stack([x, x_rev])  # (2, B, T, D)
    # One big MXU matmul for all timesteps of both directions.
    x_proj = jnp.einsum("kbtd,kdh->tkbh", xs, wi) + bi[None, :, None, :]

    if _resolve_impl(impl, 2 * b, h_dim, x.dtype) == "pallas":
        from speech_tpu.ops.gru_pallas import gru_seq_pallas

        t = x.shape[1]
        xp_rows = x_proj.reshape(t, 2 * b, 3 * h_dim)  # directions on rows
        h0 = jnp.zeros((2 * b, h_dim), x.dtype)
        hs = gru_seq_pallas(xp_rows, h0, wh, bh, 2)  # (T, 2B, H)
        fwd = jnp.swapaxes(hs[:, :b], 0, 1)
        bwd = reverse_sequences(jnp.swapaxes(hs[:, b:], 0, 1), lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)

    def step(h, xp):  # h (2, B, H), xp (2, B, 3H)
        hp = jnp.einsum("kbh,khj->kbj", h, wh) + bh[:, None, :]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2, b, h_dim), x.dtype)
    _, hs = jax.lax.scan(step, h0, x_proj, unroll=unroll)  # (T, 2, B, H)
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)  # (B, T, H)
    bwd = reverse_sequences(jnp.swapaxes(hs[:, 1], 0, 1), lengths)
    return jnp.concatenate([fwd, bwd], axis=-1)


def gru_cell_step(h: jax.Array, x: jax.Array, wi: jax.Array, bi: jax.Array,
                  wh: jax.Array, bh: jax.Array) -> jax.Array:
    """Single GRU step for incremental decoding. x: (B, D), h: (B, H)."""
    wi, bi, wh, bh = (w.astype(x.dtype) for w in (wi, bi, wh, bh))
    h = h.astype(x.dtype)
    xp = x @ wi + bi
    hp = h @ wh + bh
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h
