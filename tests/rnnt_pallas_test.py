"""Pallas RNN-T kernel parity vs the pure-JAX implementation (interpret mode
on CPU; compiled on TPU via bench/train)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.ops.rnnt import rnnt_loss
from speech_tpu.ops.rnnt_pallas import rnnt_loss_pallas


def rand_case(rng, b, t, v, u, full=False):
    logits = rng.standard_normal((b, t, u + 1, v + 1))
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), -1))
    if full:
        t_lens = np.full(b, t, np.int32)
        u_lens = np.full(b, u, np.int32)
    else:
        t_lens = rng.integers(2, t + 1, size=b).astype(np.int32)
        u_lens = rng.integers(0, u + 1, size=b).astype(np.int32)
    labels = rng.integers(0, v, size=(b, u)).astype(np.int32)
    return lp, t_lens, labels, u_lens


@pytest.mark.parametrize("full", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_forward_matches_pure(seed, full):
    rng = np.random.default_rng(seed)
    b, t, v, u = 3, 9, 5, 4
    lp, t_lens, labels, u_lens = rand_case(rng, b, t, v, u, full)
    ours = rnnt_loss_pallas(jnp.asarray(lp), jnp.asarray(t_lens),
                            jnp.asarray(labels), jnp.asarray(u_lens), v, True)
    ref = rnnt_loss(jnp.asarray(lp), jnp.asarray(t_lens),
                    jnp.asarray(labels), jnp.asarray(u_lens), blank=v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_grad_matches_pure(seed):
    rng = np.random.default_rng(10 + seed)
    b, t, v, u = 2, 7, 4, 3
    lp, t_lens, labels, u_lens = rand_case(rng, b, t, v, u)

    def f_pallas(x):
        return rnnt_loss_pallas(x, jnp.asarray(t_lens), jnp.asarray(labels),
                                jnp.asarray(u_lens), v, True).sum()

    def f_pure(x):
        return rnnt_loss(x, jnp.asarray(t_lens), jnp.asarray(labels),
                         jnp.asarray(u_lens), blank=v).sum()

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(lp)))
    g2 = np.asarray(jax.grad(f_pure)(jnp.asarray(lp)))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)
    for i in range(b):
        if t_lens[i] < t:
            assert np.abs(g1[i, t_lens[i]:]).max() == 0.0


def test_pallas_weighted_cotangent():
    rng = np.random.default_rng(5)
    b, t, v, u = 2, 6, 3, 2
    lp, t_lens, labels, u_lens = rand_case(rng, b, t, v, u, full=True)
    w = jnp.asarray([0.4, 2.2])

    def f_pallas(x):
        return (w * rnnt_loss_pallas(x, jnp.asarray(t_lens),
                                     jnp.asarray(labels), jnp.asarray(u_lens),
                                     v, True)).sum()

    def f_pure(x):
        return (w * rnnt_loss(x, jnp.asarray(t_lens), jnp.asarray(labels),
                              jnp.asarray(u_lens), blank=v)).sum()

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(lp)))
    g2 = np.asarray(jax.grad(f_pure)(jnp.asarray(lp)))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)
