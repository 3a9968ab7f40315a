"""RNN-T loss correctness: explicit numpy DP oracle + gradient checks.

No torchaudio in this environment, so the oracle is a direct O(T*U) dynamic
program implementing Graves 2012 exactly (the same recursion the reference's
native C transducer library computes, SURVEY §2.3 N2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_tpu.ops.rnnt import rnnt_loss

NEG = -np.inf


def np_rnnt_nll(lp, T, y, blank):
    """Oracle: alpha DP in float64. lp: (Tmax, U+1, V+1), y: list of labels."""
    U = len(y)
    alpha = np.full((T, U + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            stay = alpha[t - 1, u] + lp[t - 1, u, blank] if t > 0 else NEG
            emit = alpha[t, u - 1] + lp[t, u - 1, y[u - 1]] if u > 0 else NEG
            alpha[t, u] = np.logaddexp(stay, emit)
    return -(alpha[T - 1, U] + lp[T - 1, U, blank])


def rand_case(rng, b, t, v, u, full=False):
    logits = rng.standard_normal((b, t, u + 1, v + 1))
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    if full:
        t_lens = np.full(b, t, np.int32)
        u_lens = np.full(b, u, np.int32)
    else:
        t_lens = rng.integers(2, t + 1, size=b).astype(np.int32)
        u_lens = rng.integers(0, u + 1, size=b).astype(np.int32)
    labels = rng.integers(0, v, size=(b, u)).astype(np.int32)
    return np.asarray(lp, np.float64), t_lens, labels, u_lens


@pytest.mark.parametrize("full", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rnnt_loss_matches_dp(seed, full):
    rng = np.random.default_rng(seed)
    b, t, v, u = 4, 7, 5, 3
    lp, t_lens, labels, u_lens = rand_case(rng, b, t, v, u, full)
    ours = rnnt_loss(jnp.asarray(lp, jnp.float32), jnp.asarray(t_lens),
                     jnp.asarray(labels), jnp.asarray(u_lens), blank=v)
    ref = [np_rnnt_nll(lp[i], int(t_lens[i]), labels[i, :u_lens[i]].tolist(), v)
           for i in range(b)]
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_rnnt_empty_label():
    # U=0: NLL = -(sum of blank along the single row)
    rng = np.random.default_rng(3)
    b, t, v, u = 2, 5, 3, 2
    lp, _, labels, _ = rand_case(rng, b, t, v, u, full=True)
    t_lens = np.array([5, 4], np.int32)
    u_lens = np.array([0, 0], np.int32)
    ours = rnnt_loss(jnp.asarray(lp, jnp.float32), jnp.asarray(t_lens),
                     jnp.asarray(labels), jnp.asarray(u_lens), blank=v)
    for i in range(b):
        expect = -lp[i, : t_lens[i], 0, v].sum()
        np.testing.assert_allclose(float(ours[i]), expect, rtol=1e-4)


def test_rnnt_grad_finite_difference():
    rng = np.random.default_rng(4)
    b, t, v, u = 2, 4, 3, 2
    logits = rng.standard_normal((b, t, u + 1, v + 1)).astype(np.float32)
    t_lens = np.array([4, 3], np.int32)
    u_lens = np.array([2, 1], np.int32)
    labels = rng.integers(0, v, size=(b, u)).astype(np.int32)

    def f(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return rnnt_loss(lp, jnp.asarray(t_lens), jnp.asarray(labels),
                         jnp.asarray(u_lens), blank=v).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    # central finite differences on a sample of coordinates
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 2, 1, 2), (1, 1, 0, 3), (1, 2, 1, 1),
                (0, 3, 2, 3), (1, 0, 0, 0)]:
        lp = logits.copy(); lp[idx] += eps
        lm = logits.copy(); lm[idx] -= eps
        fd = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=2e-3)


def test_rnnt_masks_padding():
    rng = np.random.default_rng(5)
    b, t, v, u = 2, 6, 4, 3
    lp, _, labels, _ = rand_case(rng, b, t, v, u, full=True)
    t_lens = np.array([4, 5], np.int32)
    u_lens = np.array([2, 3], np.int32)
    f = jax.jit(lambda x: rnnt_loss(x, jnp.asarray(t_lens), jnp.asarray(labels),
                                    jnp.asarray(u_lens), blank=v))
    base = np.asarray(f(jnp.asarray(lp, jnp.float32)))
    lp2 = np.array(lp)
    lp2[0, 4:] = -7.7  # past frame length
    lp2[0, :, 3:] = -3.3  # past label length (u index > u_len)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(lp2, jnp.float32))),
                               base, rtol=1e-5)
