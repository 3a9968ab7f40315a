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


def gru_sequence(x: jax.Array, h0: jax.Array, wi: jax.Array, bi: jax.Array,
                 wh: jax.Array, bh: jax.Array) -> jax.Array:
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

    def step(h, xp):
        hp = h @ wh + bh  # (B, 3H)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, x_proj)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


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
