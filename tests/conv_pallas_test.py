"""Parity of the Pallas conv kernel-gradient (ops/conv_pallas.py) with
jax.vjp of the plain XLA conv — exact in f32, interpret mode on CPU.
Compiled-mode parity on the real chip lives in tests/tpu_compiled_test.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.ops.conv import conv_pallas_grads, conv_xla
from speech_tpu.ops.conv_pallas import conv_kernel_grad_pallas

jax.config.update("jax_enable_x64", False)


def _ref_grads(x, k, stride, g):
    _, pullback = jax.vjp(lambda xx, kk: conv_xla(xx, kk, stride), x, k)
    return pullback(g)


# (B, T, F, Ci, kh, kw, Co, stride): includes the two flagship layer shapes
# scaled down, stride 1 and 2, Ci=1 and Ci>1, and a non-dividing chunk count.
CASES = [
    (2, 37, 33, 1, 5, 9, 8, 2),    # input layer shape (scaled)
    (2, 29, 21, 8, 5, 7, 8, 1),    # inner layer shape (scaled)
    (1, 70, 17, 4, 3, 5, 8, 1),    # T > chunk (forces multi-chunk + pad)
    (3, 66, 19, 2, 4, 6, 8, 2),    # stride 2, T' > chunk
    (2, 23, 15, 3, 1, 3, 8, 1),    # kh == 1 edge
]


@pytest.mark.parametrize("b,t,f,ci,kh,kw,co,stride", CASES)
def test_kernel_grad_matches_xla_vjp(b, t, f, ci, kh, kw, co, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, f, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, ci, co)) * 0.1, jnp.float32)
    out = conv_xla(x, k, stride)
    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)

    _, dk_ref = _ref_grads(x, k, stride, g)
    dk = conv_kernel_grad_pallas(x, g, kh, kw, stride, interpret=True)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-4)


def test_conv_pallas_grads_full_vjp():
    """Full custom-VJP path (fwd + dx + dk) against XLA autodiff."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 31, 23, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 4, 8)) * 0.1, jnp.float32)

    def loss_pallas(x, k):
        return jnp.sum(conv_pallas_grads(x, k, 1, True) ** 2)

    def loss_ref(x, k):
        return jnp.sum(conv_xla(x, k, 1) ** 2)

    l1, (dx1, dk1) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(x, k)
    l2, (dx2, dk2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2),
                               rtol=1e-5, atol=1e-4)


def test_conv_relu_pallas_grads_full_vjp():
    """Fused conv+ReLU custom VJP (the round-5 layout-evidence variant)
    against XLA autodiff of relu(conv)."""
    from speech_tpu.ops.conv_pallas import conv_relu_pallas_grads

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 31, 23, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 4, 8)) * 0.1, jnp.float32)

    def loss_fused(x, k):
        return jnp.sum(conv_relu_pallas_grads(x, k, 1, True) ** 2)

    def loss_ref(x, k):
        return jnp.sum(jax.nn.relu(conv_xla(x, k, 1)) ** 2)

    l1, (dx1, dk1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, k)
    l2, (dx2, dk2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2),
                               rtol=1e-5, atol=1e-4)
