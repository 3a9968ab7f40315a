"""Fast kernel-gradients for the encoder convs (Pallas + matmul-spelled XLA).

Why: the encoder's two conv layers have tiny channel counts (C_in 1..32,
C_out 32 — reference speech/models/model.py:21-23) and XLA's KERNEL-GRAD
emitter collapses on them: measured on a v5e at the flagship shapes the
kernel-grads run at 2-10% MXU and cost ~40 ms of a ~140 ms training step
(tools/perf_conv*.py, BASELINE.md breakdown). The contraction itself is one
well-shaped matmul — ``dk = im2col(x)^T @ g`` — it just needs to be
*spelled* as one:

* ``stride == 1`` (the stack's inner layers, where ~90% of the conv FLOPs
  live): a Pallas kernel tiles the huge (B*T) contraction over a grid and
  accumulates the (K, N) product in a revisited f32 output block. The time
  taps are moved into the matmul's OUTPUT columns — columns are (kh, C_out)
  pairs built from kh shifted slices of the cotangent, rows are (kw, C_in)
  frequency windows — lifting N from C_out=32 (25% of the 128-wide MXU) to
  kh*C_out (full). Everything in-kernel is contiguous slices + concat
  (Mosaic rejects strided gathers and minor-dim reshapes).
* general stride (the input layer): explicit im2col in XLA (pure data
  movement) followed by ONE ``dot_general`` over the (B*T'*F') contraction —
  the plain matmul emitter handles what the conv-grad emitter fumbles. The
  materialized patches are (B, T', F', kh*kw*C_in); with C_in == 1 (the only
  strided layer in the reference topology) that is ~kh*kw/(s^2) x the input
  — bounded, streamed once.

Measured status on v5e (2026-08, tunnel protocol, flagship inner layer
(64,495,61,32) x (11,21,32,32)): the Pallas dk alone runs 11.7 ms vs the
XLA emitter's 26.3 ms (2.2x), with f32-accumulator accuracy (median rel err
5e-7 vs the bf16 emitter's 1.4e-3). HOWEVER, composed into a graph it is a
net LOSS, and the round-5 bisect (tools/perf_r5.py + HLO inspection)
identified exactly why — the "glue" is XLA LAYOUT ASSIGNMENT, not the
pallas_call itself:

  * pallas forces row-major {3,2,1,0} on its operands, while the TPU
    convolution emitters prefer {3,0,2,1}-family layouts at these
    small-channel shapes; when both consume the same materialized tensors
    (x, the cotangent), XLA inserts ~100 MB transposing copies.
  * with no elementwise producer pinning a layout (l1-unfold feeding l2
    directly, cotangent of a plain sum), Pallas WINS at stack level:
    58.6 ms vs 81.5 for the manual-dx VJP. With ReLUs in between, it
    LOSES: 105.2 vs 74.6 (the copies appear; verified in the compiled HLO:
    {3,2,1,0}<->{3,0,2,1} copies of the 118/60 MB operands).
  * fusing the ReLU into the custom VJP (conv_relu_pallas_grads below) does
    NOT remove the copies (112.4 ms): the operands still materialize in two
    layout domains. Removing the conv from the backward entirely (Pallas dx
    too) is the only structural fix, and dx's ci=32 output channels make an
    MXU-efficient Pallas dx kernel impossible without tap-split lane
    relayouts (designs explored and rejected in the round-5 notes,
    BASELINE.md).
  * FULL MODEL (bench.py): manual_dx 141.9 ms/step vs pallas_grads
    198.2 ms vs plain-xla 147.0 ms — winners flip between probe and full
    graph because layout assignment is global; only full-graph numbers
    decide defaults.

``encoder_conv`` therefore keeps the Pallas path OPT-IN via
``SPEECH_TPU_CONV_IMPL=pallas_grads``. The general-stride im2col spelling
measured WORSE than the emitter at every probed shape and exists for
parity/completeness only.

The forward and input-grad stay on XLA (the forward emitter is fine; the
input-grad emitter measured at parity with the manual forward-style conv).
Parity with ``jax.vjp`` of the plain XLA conv is exact in f32
(tests/conv_pallas_test.py, interpret mode; compiled on-chip in
tests/tpu_compiled_test.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kgrad_s1_kernel(kh, kw, co, mc, f_pad, x_ref, gp_ref, acc_ref, u_buf):
    """stride-1 kernel-grad: acc[(kw*Ci), (kh*Co)] += u^T @ G'.

    x_ref: (1, Mc, F, Ci) — one chunk of input rows.
    gp_ref: (1, T_pad + kh - 1, F_pad, Co) — the whole cotangent for this
      batch element: kh-1 zero rows prepended (so every tap shift is a plain
      dynamic slice) and the frequency dim zero-padded to F_pad, a multiple
      of 8, so the (rows, freq) merge below is a tile-aligned reshape.
    acc_ref: (kw*Ci, kh*Co) f32, revisited across the entire grid.
    u_buf: (Mc, F_pad, kw*Ci) scratch — the frequency unfold is STAGED
      through VMEM stores (Mosaic relayouts stores of shifted slices; a
      lane-axis concat of them it rejects), then read back contiguously.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((b == 0) & (i == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # (Mc, F, Ci)
    f_out = x.shape[1] - kw + 1
    ci = x.shape[-1]
    if f_out != u_buf.shape[1]:
        # Zero the frequency pad rows ONCE — scratch persists across grid
        # steps, and the matching cotangent rows are zero anyway; this only
        # guards against NaN garbage in uninitialized VMEM.
        @pl.when((b == 0) & (i == 0))
        def _():
            u_buf[:, f_out:, :] = jnp.zeros_like(u_buf[:, f_out:, :])
    for j in range(kw):  # j-major column order matches the dk reshape below
        u_buf[:, :f_out, j * ci:(j + 1) * ci] = x[:, j:j + f_out, :]
    u2 = u_buf[:, :, :].reshape(mc * f_pad, kw * ci)

    # G' columns: tap t (0..kh-1) holds g[tau - t] for this chunk's input
    # rows tau — slice t rows earlier in the padded cotangent. t-major.
    # (dim-0 dynamic slices keep lane/sublane offsets at 0, so this concat
    # is layout-uniform, unlike the frequency one.)
    tau0 = i * mc
    gp = jnp.concatenate(
        [gp_ref[0, pl.ds(tau0 + (kh - 1) - t, mc)] for t in range(kh)],
        axis=-1)  # (Mc, F_pad, kh*Co)
    g2 = gp.reshape(mc * f_pad, kh * co)

    acc_ref[:, :] += jax.lax.dot_general(
        u2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pad_rows(a, rows_pad):
    if a.shape[1] == rows_pad:
        return a
    return jnp.pad(a, ((0, 0), (0, rows_pad - a.shape[1]),
                       (0, 0), (0, 0)))


def _kernel_grad_s1_pallas(x, g, kh, kw, interpret):
    b, t_in, f_in, ci = x.shape
    _, t_out, f_out, co = g.shape
    f_pad = -(-f_out // 8) * 8  # tile-aligned (rows, freq) merge in-kernel
    mc = min(64, t_in)  # chunk of input rows per grid step
    t_pad = -(-t_in // mc) * mc
    xp = _pad_rows(x, t_pad)
    # Pad the cotangent to x's row extent (rows past T'-1 contribute 0)
    # plus kh-1 leading zeros so tap shifts never index negative rows, and
    # zero-pad frequency to f_pad (zero rows contribute nothing).
    gp = jnp.pad(g, ((0, 0), (kh - 1, t_pad - t_out),
                     (0, f_pad - f_out), (0, 0)))
    nb = t_pad // mc
    kern = functools.partial(_kgrad_s1_kernel, kh, kw, co, mc, f_pad)
    acc = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, mc, f_in, ci), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad + kh - 1, f_pad, co),
                         lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kw * ci, kh * co), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kw * ci, kh * co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mc, f_pad, kw * ci), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, gp)
    # acc[(j, ci), (t, co)] -> (kh, kw, ci, co)
    return acc.reshape(kw, ci, kh, co).transpose(2, 0, 1, 3)


def _kernel_grad_im2col_xla(x, g, kh, kw, stride):
    """General-stride dk as explicit patches + ONE dot_general in XLA."""
    b, t_in, f_in, ci = x.shape
    _, t_out, f_out, co = g.shape
    # Patches (B, T', F', kh, kw, Ci): strided windows in both dims.
    ti = jnp.arange(t_out)[:, None] * stride + jnp.arange(kh)[None, :]
    fi = jnp.arange(f_out)[:, None] * stride + jnp.arange(kw)[None, :]
    u = x[:, ti][:, :, :, fi]  # (B, T', kh, F', kw, Ci)
    u = u.transpose(0, 1, 3, 2, 4, 5)  # (B, T', F', kh, kw, Ci)
    u2 = u.reshape(b * t_out * f_out, kh * kw * ci)
    g2 = g.reshape(b * t_out * f_out, co)
    dk = jax.lax.dot_general(u2, g2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dk.reshape(kh, kw, ci, co)


def _kernel_grad_s1_xla(x, g, kh, kw):
    """stride-1 dk as ONE dot_general: freq-unfolded input rows against
    tap-shifted cotangent columns (the same operands as the Pallas kernel,
    materialized by XLA's fusions instead of VMEM staging)."""
    b, t_in, f_in, ci = x.shape
    _, t_out, f_out, co = g.shape
    u = jnp.concatenate([x[:, :, j:j + f_out, :] for j in range(kw)],
                        axis=-1)  # (B, T, F', kw*Ci), j-major
    gp = jnp.pad(g, ((0, 0), (kh - 1, t_in - t_out), (0, 0), (0, 0)))
    gtap = jnp.concatenate(
        [gp[:, kh - 1 - t:kh - 1 - t + t_in] for t in range(kh)],
        axis=-1)  # (B, T, F', kh*Co): tap t holds g[tau - t]
    u2 = u.reshape(b * t_in * f_out, kw * ci)
    g2 = gtap.reshape(b * t_in * f_out, kh * co)
    acc = jax.lax.dot_general(u2, g2, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return acc.reshape(kw, ci, kh, co).transpose(2, 0, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_relu_pallas_grads(x: jax.Array, kernel: jax.Array, stride: int,
                           interpret: bool = False) -> jax.Array:
    """Fused VALID conv + ReLU with Pallas kernel-grad — a MEASURED-NEGATIVE
    experiment kept as evidence, not a production path (nothing dispatches
    to it; encoder_conv applies ReLU separately).

    The hypothesis was that fusing the ReLU into the custom VJP would remove
    the cross-layout-domain copies the round-5 bisect identified (see the
    module docstring): with the mask-multiply INSIDE the backward, XLA can
    fuse it into each consumer instead of materializing a layout-pinned
    intermediate. Measured on v5e: it does NOT help — 112.4 ms for the
    composed stack vs 111.8 unfused-pallas and 86.5 manual_dx — because the
    operands still materialize once per layout domain regardless of where
    the mask lives. Retained (with its parity test) so the negative result
    stays reproducible; see BASELINE.md "Round-5 perf campaign"."""
    return jnp.maximum(_conv_xla(x, kernel, stride), 0)


def _conv_xla(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _crpg_fwd(x, kernel, stride, interpret):
    y = jnp.maximum(_conv_xla(x, kernel, stride), 0)
    return y, (x, kernel, y)


def _crpg_bwd(stride, interpret, res, g):
    from speech_tpu.ops.conv import _conv_dx_manual

    x, kernel, y = res
    kh, kw, _, _ = kernel.shape
    g = jnp.where(y > 0, g, 0)  # ReLU mask, fused into each consumer below
    dx = _conv_dx_manual(g, kernel, stride, x.shape[1], x.shape[2])
    dk = conv_kernel_grad_pallas(x, g, kh, kw, stride, interpret=interpret)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv_relu_pallas_grads.defvjp(_crpg_fwd, _crpg_bwd)


def conv_kernel_grad_pallas(x: jax.Array, g: jax.Array, kh: int, kw: int,
                            stride: int, interpret: bool = False,
                            impl: str = "auto") -> jax.Array:
    """dL/dkernel of the VALID NHWC conv, spelled as a single tiled matmul.

    Args:
      x: (B, T, F, Ci) conv input (activation dtype).
      g: (B, T', F', Co) cotangent w.r.t. the conv output.
      impl: "pallas" | "xla_matmul" | "auto". The Pallas path exists for
        stride 1 only (measured 2.2x the XLA kernel-grad emitter on the
        flagship inner layer); "auto" picks it there and the XLA im2col
        matmul for strided layers.

    Returns (kh, kw, Ci, Co) float32 — cast to the kernel dtype by callers.
    """
    if stride == 1:
        if impl == "xla_matmul":
            return _kernel_grad_s1_xla(x, g, kh, kw)
        return _kernel_grad_s1_pallas(x, g, kh, kw, interpret)
    return _kernel_grad_im2col_xla(x, g, kh, kw, stride)
