"""Decompose the flagship conv stack's backward cost and try variants.

perf_chain.py showed conv fwd ~12 ms but conv fwd+bwd ~67 ms (overhead-
corrected) — the backward is ~4.5x the forward. This probes each gradient
operand (layer-1 dW; layer-2 dW; layer-2 dx) and layout/dtype variants to
find the slow emitter. Protocol: bench.py fetch-every-other-step (see
perf_chain.py module doc).

Usage: python tools/perf_conv.py [--steps 10]
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

B, T, F = 64, 1000, 161
CONV = [[32, 11, 41, 2], [32, 11, 21, 1]]  # flagship encoder conv stack


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
    print(f"{name:40s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def conv2d(x, k, s, dn=("NHWC", "HWIO", "NHWC")):
    return jax.lax.conv_general_dilated(x, k, (s, s), "VALID",
                                        dimension_numbers=dn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, T, F, 1)), jnp.bfloat16))
    k1 = jax.device_put(jnp.asarray(
        rng.standard_normal((11, 41, 1, 32)) * 0.05, jnp.bfloat16))
    k2 = jax.device_put(jnp.asarray(
        rng.standard_normal((11, 21, 32, 32)) * 0.02, jnp.bfloat16))

    print(f"B={B} T={T} F={F} conv={CONV}", flush=True)

    timeit("null op", jax.jit(lambda a: a + 1.0), jnp.float32(0),
           steps=args.steps)

    # layer shapes
    y1 = conv2d(x, k1, 2)
    print("l1 out", y1.shape, flush=True)
    y1 = jax.device_put(jnp.asarray(
        rng.standard_normal(y1.shape), jnp.bfloat16))

    # --- forwards ---
    timeit("l1 fwd", jax.jit(
        lambda x: jnp.sum(conv2d(x, k1, 2).astype(jnp.float32))), x,
        steps=args.steps)
    timeit("l2 fwd", jax.jit(
        lambda y: jnp.sum(conv2d(y, k2, 1).astype(jnp.float32))), y1,
        steps=args.steps)

    # --- per-operand backward costs ---
    def probe(name, loss_fn, *a):
        @jax.jit
        def f(*aa):
            v, g = jax.value_and_grad(loss_fn)(*aa)
            gs = sum(jnp.sum(q.astype(jnp.float32))
                     for q in jax.tree.leaves(g))
            return v + 0.0 * gs
        timeit(name, f, *a, steps=args.steps)

    probe("l1 dW only (fwd + kernel grad)",
          lambda k: jnp.sum(conv2d(x, k, 2).astype(jnp.float32)), k1)
    probe("l2 dW only (fwd + kernel grad)",
          lambda k: jnp.sum(conv2d(y1, k, 1).astype(jnp.float32)), k2)
    probe("l2 dx only (fwd + input grad)",
          lambda y: jnp.sum(conv2d(y, k2, 1).astype(jnp.float32)), y1)

    # --- variants: f32 convs ---
    xf = x.astype(jnp.float32); k1f = k1.astype(jnp.float32)
    y1f = y1.astype(jnp.float32); k2f = k2.astype(jnp.float32)
    probe("l1 dW only, f32",
          lambda k: jnp.sum(conv2d(xf, k, 2)), k1f)
    probe("l2 dW only, f32",
          lambda k: jnp.sum(conv2d(y1f, k, 1)), k2f)
    probe("l2 dx only, f32",
          lambda y: jnp.sum(conv2d(y, k2f, 1)), y1f)

    # --- variant: freq-unfolded layer 1 (C_in=1 -> fold the 41-wide freq
    # window into channels; conv becomes (11,1) over time with C_in=41) ---
    f_out = (F - 41) // 2 + 1  # 61

    def unfold_l1(x):
        # (B,T,F,1) -> (B,T,61,41): strided windows over freq
        idx = (jnp.arange(f_out) * 2)[:, None] + jnp.arange(41)[None, :]
        return x[:, :, :, 0][:, :, idx]

    k1u = k1.reshape(11, 1, 41, 32)  # (kh, 1, C_in=41, C_out)

    def l1_unfold(x, k):
        return conv2d(unfold_l1(x), k.reshape(11, 1, 41, 32), 1)[
            :, ::2]  # stride 2 over time applied post-hoc? NO — see below

    # stride over time must stay 2; do it in the conv itself:
    def l1_unfold2(x, k):
        u = unfold_l1(x)
        return jax.lax.conv_general_dilated(
            u, k.reshape(11, 1, 41, 32), (2, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # parity check vs the 2-D conv
    ref = conv2d(x, k1, 2)
    alt = l1_unfold2(x, k1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - alt.astype(jnp.float32))))
    print("l1 unfold parity max err:", err, flush=True)

    timeit("l1 unfold fwd", jax.jit(
        lambda x: jnp.sum(l1_unfold2(x, k1).astype(jnp.float32))), x,
        steps=args.steps)
    probe("l1 unfold dW only",
          lambda k: jnp.sum(l1_unfold2(x, k).astype(jnp.float32)), k1)

    # --- whole stack fwd+bwd on params, baseline vs unfold-l1 ---
    def stack(ks):
        k1_, k2_ = ks
        h = jax.nn.relu(conv2d(x, k1_, 2))
        h = jax.nn.relu(conv2d(h, k2_, 1))
        return jnp.sum(h.astype(jnp.float32))

    def stack_unfold(ks):
        k1_, k2_ = ks
        h = jax.nn.relu(l1_unfold2(x, k1_))
        h = jax.nn.relu(conv2d(h, k2_, 1))
        return jnp.sum(h.astype(jnp.float32))

    probe("stack fwd+bwd (baseline)", stack, (k1, k2))
    probe("stack fwd+bwd (unfold l1)", stack_unfold, (k1, k2))


if __name__ == "__main__":
    main()
