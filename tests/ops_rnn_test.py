"""GRU scan parity vs torch.nn.GRU (gate conventions must match exactly)."""

import numpy as np
import jax.numpy as jnp
import torch

from speech_tpu.ops import rnn as rnn_ops


def _torch_gru_weights(gru, rng, d, h):
    wi = rng.standard_normal((d, 3 * h)).astype(np.float32) * 0.3
    bi = rng.standard_normal(3 * h).astype(np.float32) * 0.1
    wh = rng.standard_normal((h, 3 * h)).astype(np.float32) * 0.3
    bh = rng.standard_normal(3 * h).astype(np.float32) * 0.1
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(wi.T))
        gru.bias_ih_l0.copy_(torch.from_numpy(bi))
        gru.weight_hh_l0.copy_(torch.from_numpy(wh.T))
        gru.bias_hh_l0.copy_(torch.from_numpy(bh))
    return wi, bi, wh, bh


def test_gru_sequence_matches_torch():
    rng = np.random.default_rng(0)
    b, t, d, h = 3, 7, 5, 4
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    gru = torch.nn.GRU(d, h, batch_first=True)
    wi, bi, wh, bh = _torch_gru_weights(gru, rng, d, h)
    with torch.no_grad():
        ref, _ = gru(torch.from_numpy(x))
    ours = rnn_ops.gru_sequence(jnp.asarray(x), jnp.zeros((b, h)),
                                jnp.asarray(wi), jnp.asarray(bi),
                                jnp.asarray(wh), jnp.asarray(bh))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_gru_cell_step_matches_sequence():
    rng = np.random.default_rng(1)
    b, t, d, h = 2, 5, 4, 6
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((d, 3 * h)).astype(np.float32) * 0.3)
    bi = jnp.asarray(rng.standard_normal(3 * h).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.standard_normal((h, 3 * h)).astype(np.float32) * 0.3)
    bh = jnp.asarray(rng.standard_normal(3 * h).astype(np.float32) * 0.1)
    seq = rnn_ops.gru_sequence(x, jnp.zeros((b, h)), wi, bi, wh, bh)
    hstep = jnp.zeros((b, h))
    for i in range(t):
        hstep = rnn_ops.gru_cell_step(hstep, x[:, i], wi, bi, wh, bh)
        np.testing.assert_allclose(np.asarray(hstep), np.asarray(seq[:, i]),
                                   rtol=1e-5, atol=1e-6)


def test_reverse_sequences():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 6, 1))
    lengths = jnp.asarray([4, 6])
    rev = np.asarray(rnn_ops.reverse_sequences(x, lengths))[..., 0]
    # row 0: first 4 reversed, padding (4,5) untouched
    np.testing.assert_array_equal(rev[0], [3, 2, 1, 0, 4, 5])
    np.testing.assert_array_equal(rev[1], [11, 10, 9, 8, 7, 6])
    # double reverse is identity
    rev2 = rnn_ops.reverse_sequences(jnp.asarray(rev[..., None]), lengths)
    np.testing.assert_array_equal(np.asarray(rev2)[..., 0],
                                  np.asarray(x)[..., 0])
