"""GRU Pallas kernel parity vs a pure lax.scan reference (interpret mode on
CPU; compiled-TPU parity is covered by tests/tpu_compiled_test.py).

Covers the forward and the FULL custom VJP (dx_proj, dh0, dwh, dbh) for both
the single-direction and the direction-stacked (k_dirs=2) layouts that
ops/rnn.gru_sequence{,_bidir} dispatch to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.ops.gru_pallas import gru_seq_pallas


def gru_scan_ref(x_proj, h0, wh, bh, k_dirs):
    """Pure lax.scan with the same gate convention (torch GRUCell order)."""
    n = x_proj.shape[1]
    batch = n // k_dirs

    def step(h, xp):
        hps = []
        for k in range(k_dirs):
            h_k = h[k * batch:(k + 1) * batch]
            hps.append(h_k @ wh[k] + bh[k])
        hp = jnp.concatenate(hps, axis=0)
        hidden = wh.shape[1]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = hp[:, :hidden], hp[:, hidden:2 * hidden], hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        nn_ = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * nn_ + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, x_proj)
    return hs


def rand_case(seed, t, batch, hidden, k_dirs):
    rng = np.random.default_rng(seed)
    n = k_dirs * batch
    x_proj = rng.standard_normal((t, n, 3 * hidden)).astype(np.float32)
    h0 = rng.standard_normal((n, hidden)).astype(np.float32) * 0.5
    wh = (rng.standard_normal((k_dirs, hidden, 3 * hidden)) /
          np.sqrt(hidden)).astype(np.float32)
    bh = (rng.standard_normal((k_dirs, 3 * hidden)) * 0.1).astype(np.float32)
    return (jnp.asarray(x_proj), jnp.asarray(h0), jnp.asarray(wh),
            jnp.asarray(bh))


@pytest.mark.parametrize("k_dirs", [1, 2])
@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_scan(seed, k_dirs):
    x_proj, h0, wh, bh = rand_case(seed, t=12, batch=3, hidden=8,
                                   k_dirs=k_dirs)
    ours = gru_seq_pallas(x_proj, h0, wh, bh, k_dirs, True)  # interpret
    ref = gru_scan_ref(x_proj, h0, wh, bh, k_dirs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k_dirs", [1, 2])
def test_full_vjp_matches_scan(k_dirs):
    x_proj, h0, wh, bh = rand_case(7, t=9, batch=2, hidden=6, k_dirs=k_dirs)
    # Weighted cotangent so every output step contributes differently.
    w = jnp.asarray(np.random.default_rng(8).standard_normal(
        (9, k_dirs * 2, 6)).astype(np.float32))

    def f_pallas(xp, h, a, b):
        return jnp.sum(w * gru_seq_pallas(xp, h, a, b, k_dirs, True))

    def f_ref(xp, h, a, b):
        return jnp.sum(w * gru_scan_ref(xp, h, a, b, k_dirs))

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(x_proj, h0, wh, bh)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x_proj, h0, wh, bh)
    for ours, ref, name in zip(g1, g2, ("dx_proj", "dh0", "dwh", "dbh")):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bf16_activation_path():
    """bf16 x_proj/h0 with f32-accumulated gates stays close to f32."""
    x_proj, h0, wh, bh = rand_case(3, t=8, batch=2, hidden=8, k_dirs=2)
    ours = gru_seq_pallas(x_proj.astype(jnp.bfloat16),
                          h0.astype(jnp.bfloat16),
                          wh.astype(jnp.bfloat16), bh.astype(jnp.bfloat16),
                          2, True)
    ref = gru_scan_ref(x_proj, h0, wh, bh, 2)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ours, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.05)
