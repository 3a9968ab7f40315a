"""Encoder 2-D convolution, reformulated for the TPU MXU.

The encoder's convs have tiny channel counts (C_in 1..32, C_out 32 — config
``[out_c, kh, kw, stride]``, reference speech/models/model.py:21-23), and
XLA's gradient-conv emitters collapse on them: measured on a v5e at the
flagship shapes, the layer-1 kernel-grad ran at 2% MXU and the layer-2
input-grad at 8% (tools/perf_conv.py). The fix is structural: unfold the
FREQUENCY kernel taps into the channel dimension (a strided gather — pure
data movement), turning the (kh, kw) 2-D conv into a (kh, 1) time-only conv
with C_in = kw * c_in. The contraction stays identical, but every gradient
operand becomes a well-shaped conv/matmul: on the same shapes the layer-1
kernel-grad dropped 13 ms -> 2.2 ms and the full conv-stack backward lost
its pathological emitters.

Parity: exact in f32; bf16 differs only by accumulation rounding
(tests/ops_conv_test.py). Parameters keep the canonical (kh, kw, c_in,
c_out) layout, so checkpoints are interchangeable across impls.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _unfold_freq(x: jax.Array, kw: int, stride: int) -> jax.Array:
    """(B, T, F, C) -> (B, T, F', kw*C): strided windows over frequency."""
    f = x.shape[2]
    f_out = (f - kw) // stride + 1
    idx = jnp.arange(f_out)[:, None] * stride + jnp.arange(kw)[None, :]
    u = x[:, :, idx, :]  # (B, T, F', kw, C)
    return u.reshape(x.shape[0], x.shape[1], f_out, kw * x.shape[-1])


def conv_unfold_freq(x: jax.Array, kernel: jax.Array, stride: int
                     ) -> jax.Array:
    """VALID 2-D conv with stride in both dims, as freq-unfold + time conv.

    Args:
      x: (B, T, F, C) features.
      kernel: (kh, kw, C, C_out) canonical conv kernel.
      stride: applied to BOTH time and frequency (reference model.py:21-23).

    Returns (B, T', F', C_out), identical to lax.conv_general_dilated VALID.
    """
    kh, kw, c_in, c_out = kernel.shape
    u = _unfold_freq(x, kw, stride)
    ku = kernel.reshape(kh, 1, kw * c_in, c_out)
    return jax.lax.conv_general_dilated(
        u, ku, (stride, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_xla(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    """Plain XLA 2-D conv (the reference formulation)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_dx_manual(g: jax.Array, kernel: jax.Array, stride: int,
                    t_in: int, f_in: int) -> jax.Array:
    """Input gradient of the VALID conv as a FORWARD-style conv.

    XLA's autodiff emits an input-grad conv that runs at ~8% MXU on the
    encoder shapes; spelling it as a plain conv of the (dilated, padded)
    cotangent with the flipped, in/out-swapped kernel hits the forward
    emitter (measured 3x faster, tools/perf_conv2.py). For stride > 1 the
    cotangent is lhs-dilated; trailing rows the VALID window never touched
    get zero gradient via end-padding."""
    kh, kw, c_in, c_out = kernel.shape
    kf = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # (kh,kw,co,ci)
    out = jax.lax.conv_general_dilated(
        g, kf, (1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # (T'-1)*s + kh rows covered; anything beyond was never read by VALID
    pad_t = t_in - out.shape[1]
    pad_f = f_in - out.shape[2]
    if pad_t or pad_f:
        out = jnp.pad(out, ((0, 0), (0, pad_t), (0, pad_f), (0, 0)))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_manual_dx(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    """XLA conv forward + custom VJP with the manual input gradient.

    Kernel gradient stays on XLA's own kernel-grad emitter (reused via vjp
    inside the backward — it is the best of the probed variants once the
    input grad no longer dominates)."""
    return conv_xla(x, kernel, stride)


def _cmdx_fwd(x, kernel, stride):
    return conv_xla(x, kernel, stride), (x, kernel)


def _cmdx_bwd(stride, res, g):
    x, kernel = res
    kh, kw, c_in, c_out = kernel.shape
    dx = _conv_dx_manual(g, kernel, stride, x.shape[1], x.shape[2])
    # Kernel grad through the UNFOLDED formulation: materializing the freq
    # windows once (pure data movement) turns the kernel-grad conv into the
    # (kh,1)/C_in=kw*c_in shape XLA handles at ~2x the speed of the 2-D one
    # (tools/perf_conv2.py: 23 -> ~14 ms on the flagship layer 2).
    u = _unfold_freq(x, kw, stride)
    ku = kernel.reshape(kh, 1, kw * c_in, c_out)
    _, pullback = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            u, k, (stride, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), ku)
    (dku,) = pullback(g)
    dk = dku.reshape(kh, kw, c_in, c_out)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv_manual_dx.defvjp(_cmdx_fwd, _cmdx_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_pallas_grads(x: jax.Array, kernel: jax.Array, stride: int,
                      interpret: bool = False) -> jax.Array:
    """XLA conv forward + Pallas kernel-grad + XLA input-grad.

    The forward emitter is fine on these shapes; the KERNEL grad is the
    emitter that collapses. dk runs as ONE tiled Pallas matmul
    (ops/conv_pallas.py); dx stays on XLA's input-grad emitter (measured
    at parity with the manual forward-style conv on the flagship shapes).
    """
    return conv_xla(x, kernel, stride)


def _cpg_fwd(x, kernel, stride, interpret):
    return conv_xla(x, kernel, stride), (x, kernel)


def _cpg_bwd(stride, interpret, res, g):
    from speech_tpu.ops.conv_pallas import conv_kernel_grad_pallas

    x, kernel = res
    kh, kw, _, _ = kernel.shape
    # dx as the explicit forward-style conv (measured at parity with XLA's
    # input-grad emitter on the flagship shapes, without re-tracing the
    # primal through jax.vjp; the KERNEL grad is the emitter that collapses).
    dx = _conv_dx_manual(g, kernel, stride, x.shape[1], x.shape[2])
    dk = conv_kernel_grad_pallas(x, g, kh, kw, stride, interpret=interpret)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv_pallas_grads.defvjp(_cpg_fwd, _cpg_bwd)


def encoder_conv(x: jax.Array, kernel: jax.Array, stride: int,
                 impl: str = "auto") -> jax.Array:
    """Dispatch the encoder conv formulation.

    "auto" on TPU: C_in == 1 layers (the feature-input layer) run the unfold
    formulation — its forward is cheaper AND every gradient is well-shaped;
    C_in > 1 layers keep the XLA forward with the manual-dx custom VJP.
    ``SPEECH_TPU_CONV_IMPL`` overrides the C_in > 1 stride-1 choice (e.g.
    ``pallas_grads`` routes the kernel-grad through the Pallas matmul
    spelling in ops/conv_pallas.py — measured 2.2x the XLA kernel-grad
    emitter in isolation on the flagship inner layer, but see the module
    doc there for the in-graph caveat). Off-TPU: plain conv (the emitters
    are fine there, and the Pallas kernel targets Mosaic).
    """
    if impl == "auto":
        if jax.devices()[0].platform != "tpu":
            impl = "xla"
        elif x.shape[-1] == 1:
            impl = "unfold"
        elif stride == 1:
            impl = os.environ.get("SPEECH_TPU_CONV_IMPL", "manual_dx")
        else:
            impl = "manual_dx"
    if impl == "pallas_grads":
        return conv_pallas_grads(x, kernel, stride)
    if impl == "unfold":
        return conv_unfold_freq(x, kernel, stride)
    if impl == "xla":
        return conv_xla(x, kernel, stride)
    if impl == "manual_dx":
        return conv_manual_dx(x, kernel, stride)
    raise ValueError(f"unknown conv impl {impl!r}; have auto, pallas_grads, "
                     "unfold, xla, manual_dx")
