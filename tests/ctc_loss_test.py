"""CTC loss parity vs torch.nn.functional.ctc_loss (values and gradients).

The reference offloads CTC to warp-ctc (SURVEY §2.3 N1); torch's native CTC
implements the same Graves 2006 recursion and serves as the independent oracle
here. blank is the LAST index throughout (reference ctc_model.py:17-18).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from speech_tpu.ops.ctc import ctc_loss


def _torch_ctc(logits, logit_lens, labels, label_lens, blank):
    lp = tF.log_softmax(torch.from_numpy(logits).double(), dim=-1)
    lp = lp.transpose(0, 1)  # (T, B, C)
    return tF.ctc_loss(lp, torch.from_numpy(labels),
                       torch.from_numpy(logit_lens), torch.from_numpy(label_lens),
                       blank=blank, reduction="none", zero_infinity=False)


def _rand_case(rng, b, t, v, u, full_len=False):
    logits = rng.standard_normal((b, t, v + 1)).astype(np.float32)
    if full_len:
        logit_lens = np.full(b, t, dtype=np.int64)
        label_lens = np.full(b, u, dtype=np.int64)
    else:
        logit_lens = rng.integers(max(2 * u, 2), t + 1, size=b).astype(np.int64)
        label_lens = rng.integers(1, u + 1, size=b).astype(np.int64)
    labels = rng.integers(0, v, size=(b, u)).astype(np.int64)
    labels = labels * (np.arange(u)[None, :] < label_lens[:, None])
    return logits, logit_lens, labels, label_lens


@pytest.mark.parametrize("full_len", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch(seed, full_len):
    rng = np.random.default_rng(seed)
    b, t, v, u = 4, 12, 6, 4
    logits, logit_lens, labels, label_lens = _rand_case(rng, b, t, v, u, full_len)
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, blank=v)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens), blank=v)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_repeated_labels():
    # repeats force the no-skip path through the lattice
    rng = np.random.default_rng(3)
    b, t, v, u = 2, 10, 3, 4
    logits = rng.standard_normal((b, t, v + 1)).astype(np.float32)
    labels = np.array([[1, 1, 2, 2], [0, 0, 0, 0]], dtype=np.int64)
    logit_lens = np.array([10, 9], dtype=np.int64)
    label_lens = np.array([4, 3], dtype=np.int64)
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, blank=v)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens), blank=v)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_empty_label():
    rng = np.random.default_rng(4)
    b, t, v, u = 2, 6, 3, 2
    logits = rng.standard_normal((b, t, v + 1)).astype(np.float32)
    labels = np.zeros((b, u), dtype=np.int64)
    logit_lens = np.array([6, 5], dtype=np.int64)
    label_lens = np.array([0, 1], dtype=np.int64)
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, blank=v)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens), blank=v)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_torch():
    rng = np.random.default_rng(5)
    b, t, v, u = 3, 11, 5, 3
    logits, logit_lens, labels, label_lens = _rand_case(rng, b, t, v, u)

    tl = torch.from_numpy(logits).double().requires_grad_(True)
    lp = tF.log_softmax(tl, dim=-1).transpose(0, 1)
    ref = tF.ctc_loss(lp, torch.from_numpy(labels), torch.from_numpy(logit_lens),
                      torch.from_numpy(label_lens), blank=v, reduction="sum",
                      zero_infinity=False)
    ref.backward()
    ref_grad = tl.grad.numpy()

    f = lambda lg: ctc_loss(lg, jnp.asarray(logit_lens), jnp.asarray(labels),
                            jnp.asarray(label_lens), blank=v).sum()
    ours_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(ours_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_ctc_loss_jits_and_masks_padding():
    # changing values past the true lengths must not change the loss
    rng = np.random.default_rng(6)
    b, t, v, u = 2, 9, 4, 3
    logits, logit_lens, labels, label_lens = _rand_case(rng, b, t, v, u)
    logit_lens = np.array([6, 7], dtype=np.int64)
    f = jax.jit(lambda lg: ctc_loss(lg, jnp.asarray(logit_lens),
                                    jnp.asarray(labels),
                                    jnp.asarray(label_lens), blank=v))
    base = np.asarray(f(jnp.asarray(logits)))
    logits2 = logits.copy()
    logits2[0, 6:] = 123.0
    logits2[1, 7:] = -55.0
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(logits2))), base,
                               rtol=1e-6, atol=1e-6)
