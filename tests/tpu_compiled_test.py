"""COMPILED-mode Pallas kernel parity on a real TPU chip.

The interpret-mode suites (tests/{gru,ctc,rnnt}_pallas_test.py) validate the
kernel math on CPU; this file runs the SAME kernels compiled (interpret=False)
on the chip that produces every BENCH number, against the pure-JAX references.
Skipped automatically unless the session's default backend is a TPU — run as:

    SPEECH_TPU_TEST_TPU=1 python -m pytest tests/tpu_compiled_test.py -v
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu


# ---------------------------------------------------------------------------
# GRU recurrence kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k_dirs", [1, 2])
def test_gru_compiled_forward_and_vjp(k_dirs):
    from speech_tpu.ops.gru_pallas import gru_seq_pallas
    from tests.gru_pallas_test import gru_scan_ref, rand_case

    t, batch, hidden = 24, 8, 64
    x_proj, h0, wh, bh = rand_case(0, t=t, batch=batch, hidden=hidden,
                                   k_dirs=k_dirs)
    ours = jax.jit(
        lambda *a: gru_seq_pallas(*a, k_dirs, False))(x_proj, h0, wh, bh)
    ref = gru_scan_ref(x_proj, h0, wh, bh, k_dirs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        ours.shape).astype(np.float32))

    def f_pallas(xp, h, a, b):
        return jnp.sum(w * gru_seq_pallas(xp, h, a, b, k_dirs, False))

    def f_ref(xp, h, a, b):
        return jnp.sum(w * gru_scan_ref(xp, h, a, b, k_dirs))

    g1 = jax.jit(jax.grad(f_pallas, argnums=(0, 1, 2, 3)))(x_proj, h0, wh, bh)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x_proj, h0, wh, bh)
    # dwh/dbh are T-length f32 reductions whose accumulation ORDER differs
    # between the kernel path and the scan reference on TPU; allow the
    # resulting few-ulp drift (observed max rel 5e-3 on one element).
    for ours_g, ref_g, name in zip(g1, g2, ("dx_proj", "dh0", "dwh", "dbh")):
        np.testing.assert_allclose(np.asarray(ours_g), np.asarray(ref_g),
                                   rtol=1e-2, atol=5e-4, err_msg=name)


# ---------------------------------------------------------------------------
# CTC loss kernel
# ---------------------------------------------------------------------------


def test_ctc_compiled_forward_and_grad():
    from speech_tpu.ops.ctc import ctc_loss
    from speech_tpu.ops.ctc_pallas import ctc_loss_pallas
    from tests.ctc_pallas_test import rand_case

    rng = np.random.default_rng(0)
    b, t, v, u = 4, 50, 28, 12
    logits, t_lens, labels, u_lens = rand_case(rng, b, t, v, u)
    args = (jnp.asarray(logits), jnp.asarray(t_lens), jnp.asarray(labels),
            jnp.asarray(u_lens))

    ours = jax.jit(lambda lg: ctc_loss_pallas(lg, *args[1:], v, False))(args[0])
    ref = ctc_loss(*args, blank=v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    g1 = jax.jit(jax.grad(
        lambda lg: ctc_loss_pallas(lg, *args[1:], v, False).sum()))(args[0])
    g2 = jax.grad(lambda lg: ctc_loss(lg, *args[1:], blank=v).sum())(args[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=5e-4)
    # padding rows must have zero grad on the compiled path too
    g1 = np.asarray(g1)
    for i in range(b):
        if t_lens[i] < t:
            assert np.abs(g1[i, t_lens[i]:]).max() == 0.0


# ---------------------------------------------------------------------------
# RNN-T loss kernel
# ---------------------------------------------------------------------------


def test_rnnt_compiled_forward_and_grad():
    from speech_tpu.ops.rnnt import rnnt_loss
    from speech_tpu.ops.rnnt_pallas import rnnt_loss_pallas

    rng = np.random.default_rng(0)
    b, t, u, v = 3, 20, 8, 16
    raw = rng.standard_normal((b, t, u + 1, v + 1)).astype(np.float32)
    log_probs = jnp.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))
    t_lens = jnp.asarray(rng.integers(u + 2, t + 1, size=b), jnp.int32)
    u_lens = jnp.asarray(rng.integers(1, u + 1, size=b), jnp.int32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, u)), jnp.int32)

    ours = jax.jit(lambda lp: rnnt_loss_pallas(
        lp, t_lens, labels, u_lens, v, False))(log_probs)
    ref = rnnt_loss(log_probs, t_lens, labels, u_lens, blank=v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)

    g1 = jax.jit(jax.grad(lambda lp: rnnt_loss_pallas(
        lp, t_lens, labels, u_lens, v, False).sum()))(log_probs)
    g2 = jax.grad(lambda lp: rnnt_loss(
        lp, t_lens, labels, u_lens, blank=v).sum())(log_probs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Conv kernel-grad kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_kernel_grad_compiled(stride):
    from speech_tpu.ops.conv import conv_xla
    from speech_tpu.ops.conv_pallas import conv_kernel_grad_pallas

    rng = np.random.default_rng(0)
    b, t, f, ci, kh, kw, co = 4, 100, 41, (1 if stride == 2 else 8), 5, 9, 32
    x = jnp.asarray(rng.standard_normal((b, t, f, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, ci, co)) * 0.1, jnp.float32)
    out = conv_xla(x, k, stride)
    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)

    _, pullback = jax.vjp(lambda kk: conv_xla(x, kk, stride), k)
    (dk_ref,) = pullback(g)
    dk = jax.jit(lambda xx, gg: conv_kernel_grad_pallas(
        xx, gg, kh, kw, stride))(x, g)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-3, atol=1e-3)
