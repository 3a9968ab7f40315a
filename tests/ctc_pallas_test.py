"""Pallas CTC kernel parity vs the pure-JAX implementation (interpret mode on
CPU; the same kernel compiles on TPU and is exercised by bench/train)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.ops.ctc import ctc_loss
from speech_tpu.ops.ctc_pallas import ctc_loss_pallas


def rand_case(rng, b, t, v, u, full=False):
    logits = rng.standard_normal((b, t, v + 1)).astype(np.float32)
    if full:
        t_lens = np.full(b, t, np.int32)
        u_lens = np.full(b, u, np.int32)
    else:
        t_lens = rng.integers(max(2 * u, 2), t + 1, size=b).astype(np.int32)
        u_lens = rng.integers(0, u + 1, size=b).astype(np.int32)
    labels = rng.integers(0, v, size=(b, u)).astype(np.int32)
    return logits, t_lens, labels, u_lens


@pytest.mark.parametrize("full", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_forward_matches_pure(seed, full):
    rng = np.random.default_rng(seed)
    b, t, v, u = 3, 20, 6, 5
    logits, t_lens, labels, u_lens = rand_case(rng, b, t, v, u, full)
    ours = ctc_loss_pallas(jnp.asarray(logits), jnp.asarray(t_lens),
                           jnp.asarray(labels), jnp.asarray(u_lens), v,
                           True)  # blank=v, interpret
    ref = ctc_loss(jnp.asarray(logits), jnp.asarray(t_lens),
                   jnp.asarray(labels), jnp.asarray(u_lens), blank=v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_grad_matches_pure(seed):
    rng = np.random.default_rng(10 + seed)
    b, t, v, u = 2, 14, 5, 4
    logits, t_lens, labels, u_lens = rand_case(rng, b, t, v, u)

    def f_pallas(lg):
        return ctc_loss_pallas(lg, jnp.asarray(t_lens), jnp.asarray(labels),
                               jnp.asarray(u_lens), v, True).sum()

    def f_pure(lg):
        return ctc_loss(lg, jnp.asarray(t_lens), jnp.asarray(labels),
                        jnp.asarray(u_lens), blank=v).sum()

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(logits)))
    g2 = np.asarray(jax.grad(f_pure)(jnp.asarray(logits)))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)
    # padding rows must have zero grad
    for i in range(b):
        if t_lens[i] < t:
            assert np.abs(g1[i, t_lens[i]:]).max() == 0.0


def test_pallas_weighted_cotangent():
    rng = np.random.default_rng(3)
    b, t, v, u = 2, 10, 4, 3
    logits, t_lens, labels, u_lens = rand_case(rng, b, t, v, u)
    w = jnp.asarray([0.3, 1.7])

    def f_pallas(lg):
        return (w * ctc_loss_pallas(lg, jnp.asarray(t_lens),
                                    jnp.asarray(labels), jnp.asarray(u_lens),
                                    v, True)).sum()

    def f_pure(lg):
        return (w * ctc_loss(lg, jnp.asarray(t_lens), jnp.asarray(labels),
                             jnp.asarray(u_lens), blank=v)).sum()

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(logits)))
    g2 = np.asarray(jax.grad(f_pure)(jnp.asarray(logits)))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)
