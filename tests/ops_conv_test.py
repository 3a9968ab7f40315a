"""Parity of the MXU-friendly freq-unfold conv vs the plain XLA conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.ops.conv import conv_unfold_freq, conv_xla, encoder_conv


@pytest.mark.parametrize("shape,kern,stride", [
    ((2, 50, 161, 1), (11, 41, 1, 32), 2),   # flagship layer 1
    ((2, 20, 61, 32), (11, 21, 32, 32), 1),  # flagship layer 2
    ((3, 30, 40, 4), (5, 9, 4, 8), 2),       # tiny odd shapes
    ((1, 7, 7, 2), (3, 3, 2, 4), 3),         # stride > kernel overlap
])
def test_unfold_matches_xla_f32(shape, kern, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(kern) * 0.1, jnp.float32)
    ref = conv_xla(x, k, stride)
    alt = conv_unfold_freq(x, k, stride)
    assert alt.shape == ref.shape
    np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unfold_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 33, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 3, 8)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 10, 14, 8)), jnp.float32)

    def loss(fn):
        return lambda xx, kk: jnp.sum(fn(xx, kk, 2) * g)

    dx_ref, dk_ref = jax.grad(loss(conv_xla), argnums=(0, 1))(x, k)
    dx_alt, dk_alt = jax.grad(loss(conv_unfold_freq), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_alt), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_alt), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,kern,stride", [
    ((2, 20, 61, 32), (11, 21, 32, 32), 1),  # flagship layer 2
    ((2, 24, 33, 3), (5, 7, 3, 8), 2),       # strided, odd sizes
    ((1, 9, 10, 2), (3, 4, 2, 4), 3),        # stride 3, unused tail rows
])
def test_manual_dx_vjp_matches_autodiff(shape, kern, stride):
    """conv_manual_dx: forward identical; BOTH grads match XLA autodiff."""
    from speech_tpu.ops.conv import conv_manual_dx

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(kern) * 0.1, jnp.float32)
    ref = conv_xla(x, k, stride)
    alt = conv_manual_dx(x, k, stride)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

    def loss(fn):
        return lambda xx, kk: jnp.sum(fn(xx, kk, stride) * g)

    dx_ref, dk_ref = jax.grad(loss(conv_xla), argnums=(0, 1))(x, k)
    dx_alt, dk_alt = jax.grad(loss(conv_manual_dx), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_alt), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_alt), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-5)


def test_encoder_conv_dispatch():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 12, 17, 2)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 5, 2, 4)) * 0.1, jnp.float32)
    a = encoder_conv(x, k, 2, impl="xla")
    b = encoder_conv(x, k, 2, impl="unfold")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="impl"):
        encoder_conv(x, k, 2, impl="winograd")
