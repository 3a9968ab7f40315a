"""Layer-2 conv backward variants: freq-unfold autodiff vs manual VJP.

Follow-up to perf_conv.py: layer 2's input-grad (39 ms, 8% MXU) and
kernel-grad (23 ms) dominate the conv backward. Probes (a) the freq-unfold
formulation's full autodiff (does the overlap-add transpose of the unfold
gather kill it?), (b) a manual forward-style conv for dx.

Usage: python tools/perf_conv2.py [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from speech_tpu.training.trainer import enable_compilation_cache

B, TT, FF, C = 64, 495, 61, 32  # layer-2 input shape
KH, KW, CO = 11, 21, 32


def timeit(name, fn, *args, steps=10):
    out = fn(*args)
    v = float(out)
    assert np.isfinite(v), (name, v)
    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(*args)
        if i % 2 == 1:
            _ = float(out)
    _ = float(out)
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def conv2d(x, k, s=(1, 1), pad="VALID"):
    return jax.lax.conv_general_dilated(
        x, k, s, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((B, TT, FF, C)), jnp.bfloat16))
    k2 = jax.device_put(jnp.asarray(
        rng.standard_normal((KH, KW, C, CO)) * 0.02, jnp.bfloat16))

    timeit("null op", jax.jit(lambda a: a + 1.0), jnp.float32(0),
           steps=args.steps)

    f_out = FF - KW + 1  # 41

    def unfold(yv):
        idx = jnp.arange(f_out)[:, None] + jnp.arange(KW)[None, :]
        u = yv[:, :, idx]  # (B,T,41,21,C)
        return u.reshape(B, TT, f_out, KW * C)

    def l2_unfold(yv, k):
        return conv2d(unfold(yv), k.reshape(KH, 1, KW * C, CO), (1, 1))

    ref = conv2d(y, k2)
    alt = l2_unfold(y, k2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - alt.astype(jnp.float32))))
    print("l2 unfold parity max err:", err, flush=True)

    def probe(name, loss_fn, *a):
        @jax.jit
        def f(*aa):
            v, g = jax.value_and_grad(loss_fn)(*aa)
            gs = sum(jnp.sum(q.astype(jnp.float32))
                     for q in jax.tree.leaves(g))
            return v + 0.0 * gs
        timeit(name, f, *a, steps=args.steps)

    timeit("l2 unfold fwd", jax.jit(
        lambda yv: jnp.sum(l2_unfold(yv, k2).astype(jnp.float32))), y,
        steps=args.steps)
    probe("l2 unfold dW only",
          lambda k: jnp.sum(l2_unfold(y, k).astype(jnp.float32)), k2)
    probe("l2 unfold dx only (overlap-add transpose)",
          lambda yv: jnp.sum(l2_unfold(yv, k2).astype(jnp.float32)), y)
    probe("l2 unfold dW+dx",
          lambda a: jnp.sum(l2_unfold(a[0], a[1]).astype(jnp.float32)),
          (y, k2))

    # manual dx: forward-style conv of padded g with flipped/swapped kernel
    g = jax.device_put(jnp.asarray(
        rng.standard_normal(ref.shape), jnp.bfloat16))

    def dx_manual(gv, k):
        kf = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)  # (KH,KW,CO,C)
        return conv2d(gv, kf, (1, 1),
                      pad=[(KH - 1, KH - 1), (KW - 1, KW - 1)])

    # parity vs autodiff dx
    dx_ad = jax.grad(
        lambda yv: jnp.sum(conv2d(yv, k2).astype(jnp.float32) * g.astype(jnp.float32)))(y)
    dx_mn = dx_manual(g, k2)
    err2 = float(jnp.max(jnp.abs(dx_ad.astype(jnp.float32)
                                 - dx_mn.astype(jnp.float32))))
    print("manual dx parity max err:", err2, flush=True)

    timeit("l2 dx manual (fwd-style conv)", jax.jit(
        lambda gv: jnp.sum(dx_manual(gv, k2).astype(jnp.float32))), g,
        steps=args.steps)

    # manual dx for the UNFOLDED formulation: kernel (KH,1,KWC,CO) conv over
    # (B,T,41,KWC) grads -> unfolded-input grads, then overlap-add via the
    # unfold transpose is avoided: fold happens by summing shifted slices.
    def dx_unfold_manual(gv, k):
        ku = k.reshape(KH, 1, KW * C, CO)
        kf = jnp.flip(ku, axis=(0,)).transpose(0, 1, 3, 2)  # (KH,1,CO,KWC)
        du = conv2d(gv, kf, (1, 1), pad=[(KH - 1, KH - 1), (0, 0)])
        du = du.reshape(B, TT, f_out, KW, C)
        # overlap-add over the 21 freq taps: dy[:, :, f+j] += du[:, :, f, j]
        out = jnp.zeros((B, TT, FF, C), du.dtype)
        for j in range(KW):
            out = out.at[:, :, j:j + f_out].add(du[:, :, :, j])
        return out

    dx_mn2 = dx_unfold_manual(g, k2)
    err3 = float(jnp.max(jnp.abs(dx_ad.astype(jnp.float32)
                                 - dx_mn2.astype(jnp.float32))))
    print("unfold-manual dx parity max err:", err3, flush=True)
    timeit("l2 dx unfold-manual", jax.jit(
        lambda gv: jnp.sum(dx_unfold_manual(gv, k2).astype(jnp.float32))), g,
        steps=args.steps)


if __name__ == "__main__":
    main()
