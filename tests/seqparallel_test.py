"""Sequence-parallel (time-sharded) conv + GRU parity tests on a virtual
8-device CPU mesh (SURVEY §5.7: the long-audio path — conv halo exchange +
wavefront GRU with ppermute carries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.ops import rnn as rnn_ops
from speech_tpu.parallel import seqparallel as sp


def _gru_weights(rng, d, h):
    return (jnp.asarray(rng.standard_normal((d, 3 * h)) * 0.2, jnp.float32),
            jnp.asarray(rng.standard_normal((3 * h,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((h, 3 * h)) * 0.2, jnp.float32),
            jnp.asarray(rng.standard_normal((3 * h,)) * 0.1, jnp.float32))


@pytest.fixture(scope="module")
def mesh():
    return sp.make_seq_mesh(4)


def test_conv_time_sharded_matches_unsharded(mesh):
    rng = np.random.default_rng(0)
    b, t, f, c, o = 2, 64, 13, 3, 5
    kh, kw, stride = 5, 4, 2
    x = jnp.asarray(rng.standard_normal((b, t, f, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, c, o)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((o,)) * 0.1, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, k, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    out = sp.conv_time_sharded(mesh, x, k, bias, stride)
    # sharded output is padded with zero rows past the global VALID range
    assert out.shape[1] >= ref.shape[1]
    np.testing.assert_allclose(np.asarray(out[:, : ref.shape[1]]),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(out[:, ref.shape[1]:]) == 0)


def test_conv_time_sharded_stride1(mesh):
    rng = np.random.default_rng(1)
    b, t, f, c, o = 1, 32, 8, 2, 3
    kh, kw, stride = 3, 3, 1
    x = jnp.asarray(rng.standard_normal((b, t, f, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, c, o)) * 0.1, jnp.float32)
    bias = jnp.zeros((o,), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = sp.conv_time_sharded(mesh, x, k, bias, stride)
    np.testing.assert_allclose(np.asarray(out[:, : ref.shape[1]]),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_seq_sharded_matches_unsharded(mesh, reverse):
    rng = np.random.default_rng(2)
    b, t, d, h = 2, 48, 6, 8
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    wi, bi, wh, bh = _gru_weights(rng, d, h)

    if reverse:
        lens = jnp.full((b,), t, jnp.int32)
        x_rev = rnn_ops.reverse_sequences(x, lens)
        ref = rnn_ops.reverse_sequences(
            rnn_ops.gru_sequence(x_rev, jnp.zeros((b, h)), wi, bi, wh, bh),
            lens)
    else:
        ref = rnn_ops.gru_sequence(x, jnp.zeros((b, h)), wi, bi, wh, bh)
    out = sp.gru_seq_sharded(mesh, x, wi, bi, wh, bh, reverse=reverse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bigru_seq_sharded_matches_encoder_layer(mesh):
    rng = np.random.default_rng(3)
    b, t, d, h = 2, 32, 5, 7
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    fwd_w = _gru_weights(rng, d, h)
    bwd_w = _gru_weights(rng, d, h)
    lens = jnp.full((b,), t, jnp.int32)
    ref = rnn_ops.gru_sequence_bidir(
        x, lens, *[jnp.stack([f, bb]) for f, bb in zip(fwd_w, bwd_w)])
    out = sp.bigru_seq_sharded(mesh, x, fwd_w, bwd_w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_encoder_seq_sharded_matches_unsharded(mesh):
    from speech_tpu.models.encoder import Encoder, EncoderConfig, conv_out_size

    cfg = EncoderConfig(conv=((3, 5, 9, 2),), rnn_dim=8, rnn_layers=2,
                        bidirectional=True)
    enc = Encoder(cfg)
    rng = np.random.default_rng(5)
    b, t, f = 2, 64, 20
    x = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), x, lens)["params"]
    ref, out_lens = enc.apply({"params": params}, x, lens)
    true_t = conv_out_size(cfg.conv, t, dim=0)
    assert int(out_lens[0]) == true_t

    out = sp.encoder_seq_sharded(mesh, params, cfg, x)
    assert out.shape[1] >= true_t
    np.testing.assert_allclose(np.asarray(out[:, :true_t]),
                               np.asarray(ref[:, :true_t]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gru_seq_sharded_grads_flow(mesh):
    rng = np.random.default_rng(4)
    b, t, d, h = 1, 16, 4, 4
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    wi, bi, wh, bh = _gru_weights(rng, d, h)

    def loss(wi):
        return sp.gru_seq_sharded(mesh, x, wi, bi, wh, bh).sum()

    g = jax.grad(loss)(wi)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference spot check
    eps = 1e-3
    d0 = jnp.zeros_like(wi).at[0, 0].set(1.0)
    fd = (loss(wi + eps * d0) - loss(wi - eps * d0)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=1e-2, atol=1e-3)
