"""Round-5 perf workbench: conv pallas-grad glue bisect + GRU bwd variants.

VERDICT r4 next-step #1: close the 141.7 ms step toward the committed
70-90 ms floor. Two named leads:

  (a) the Pallas conv kernel-grad is 2.2x the XLA emitter in isolation but a
      net LOSS in the full graph (suspected pallas_call-boundary glue).
      ``conv`` mode bisects: dk alone (both impls), dk+pad, full layer-2
      backward (manual_dx vs pallas_grads), full conv-stack backward.
  (b) GRU bwd ~54 ms vs the ~35 ms 2x-floor estimate. ``gru`` mode A/Bs the
      backward kernel's dhp staging (lane-axis concat inside the sequential
      loop vs VMEM scratch stores — SPEECH_TPU_GRU_DHP) and the weight-grad
      einsum spelling.

Timing protocol = tools/perf_chain.py (fetch the scalar every other step;
block_until_ready does not synchronize through this tunnel).

Usage: python tools/perf_r5.py conv|gru|step [--steps 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from speech_tpu.training.trainer import enable_compilation_cache


def timeit(name, fn, *args, steps=10):
    out = fn(*args)  # compile
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


def null_op(steps=10):
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros((), jnp.float32)
    return timeit("null op (dispatch+fetch overhead)", f, x, steps=steps)


# --- conv bisect -----------------------------------------------------------

L2_X = (64, 495, 61, 32)  # flagship inner-layer input (B, T, F, C)
L2_K = (11, 21, 32, 32)
L1_X = (64, 1000, 161, 1)
L1_K = (5, 32, 1, 32)
L1_STRIDE = 2


def conv_mode(steps):
    from speech_tpu.ops import conv as conv_ops
    from speech_tpu.ops.conv_pallas import conv_kernel_grad_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(L2_X), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(L2_K) * 0.05, jnp.bfloat16)
    kh, kw, ci, co = L2_K
    t_out = L2_X[1] - kh + 1
    f_out = L2_X[2] - kw + 1
    g = jnp.asarray(rng.standard_normal((L2_X[0], t_out, f_out, co)),
                    jnp.bfloat16)

    def s(v):
        return jnp.sum(v.astype(jnp.float32))

    null = null_op(steps=steps)

    # 1. dk alone
    timeit("l2 dk: XLA emitter", jax.jit(
        lambda x, g: s(jax.vjp(lambda kk: conv_ops.conv_xla(x, kk, 1), k)[1](g)[0])), x, g,
        steps=steps)
    timeit("l2 dk: pallas", jax.jit(
        lambda x, g: s(conv_kernel_grad_pallas(x, g, kh, kw, 1))), x, g,
        steps=steps)
    timeit("l2 dk: xla_matmul spelling", jax.jit(
        lambda x, g: s(conv_kernel_grad_pallas(x, g, kh, kw, 1,
                                               impl="xla_matmul"))), x, g,
        steps=steps)

    # 2. dx alone
    timeit("l2 dx: manual fwd-style conv", jax.jit(
        lambda g, k: s(conv_ops._conv_dx_manual(g, k, 1, L2_X[1], L2_X[2]))),
        g, k, steps=steps)
    timeit("l2 dx: XLA input-grad emitter", jax.jit(
        lambda x, g, k: s(jax.vjp(
            lambda xx: conv_ops.conv_xla(xx, k, 1), x)[1](g)[0])), x, g, k,
        steps=steps)

    # 3. full layer-2 fwd+bwd through each custom-VJP wrapper
    for name, impl in [("manual_dx", "manual_dx"),
                       ("pallas_grads", "pallas_grads"),
                       ("plain xla", "xla")]:
        @jax.jit
        def f(x, k, impl=impl):
            def loss(args):
                xx, kk = args
                return s(conv_ops.encoder_conv(xx, kk, 1, impl=impl))
            l, gr = jax.value_and_grad(loss)((x, k))
            return l + 0.0 * (s(gr[0]) + s(gr[1]))
        timeit(f"l2 fwd+bwd: {name}", f, x, k, steps=steps)

    # 4. full conv stack (l1 strided + relu + l2) fwd+bwd
    x1 = jnp.asarray(rng.standard_normal(L1_X), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal(L1_K) * 0.05, jnp.bfloat16)

    for name, impl2 in [("manual_dx", "manual_dx"),
                        ("pallas_grads", "pallas_grads")]:
        @jax.jit
        def f(x1, k1, k2, impl2=impl2):
            def loss(args):
                xx, kk1, kk2 = args
                h = conv_ops.encoder_conv(xx, kk1, L1_STRIDE, impl="unfold")
                h = jax.nn.relu(h)
                h = h[:, :L2_X[1], :L2_X[2], :]
                h = conv_ops.encoder_conv(h, kk2, 1, impl=impl2)
                return s(jax.nn.relu(h))
            l, gr = jax.value_and_grad(loss)((x1, k1, k2))
            return l + 0.0 * sum(s(t) for t in gr)
        timeit(f"conv stack fwd+bwd: l2={name}", f, x1, k1, k, steps=steps)
    print(f"(null overhead {null * 1e3:.1f} ms included in every row)")


# --- gru bwd ---------------------------------------------------------------


def gru_mode(steps):
    from speech_tpu.ops.gru_pallas import gru_seq_pallas

    t, b, h = 495, 64, 512
    n = 2 * b  # bidirectional row stacking
    rng = np.random.default_rng(1)
    xp = jnp.asarray(rng.standard_normal((t, n, 3 * h)) * 0.1, jnp.bfloat16)
    h0 = jnp.zeros((n, h), jnp.bfloat16)
    wh = jnp.asarray(rng.standard_normal((2, h, 3 * h)) * 0.03, jnp.bfloat16)
    bh = jnp.zeros((2, 3 * h), jnp.bfloat16)

    def s(v):
        return jnp.sum(v.astype(jnp.float32))

    null = null_op(steps=steps)

    layers = 4  # chain the flagship's 4 layers so the op clears the ~15 ms
    # dispatch noise floor (a single layer's net time is ~4 ms)

    def stack(args):
        xp, h0, wh, bh = args
        out = xp
        for _ in range(layers):
            hs = gru_seq_pallas(out, h0, wh, bh, 2)
            # cheap stand-in for the inter-layer input projection: keeps the
            # recurrence shapes identical without timing the real matmul
            out = jnp.concatenate([hs, hs, hs], axis=-1) * 0.1
        return s(out)

    @jax.jit
    def fwd(xp, h0, wh, bh):
        return stack((xp, h0, wh, bh))

    @jax.jit
    def fwdbwd(xp, h0, wh, bh):
        l, gr = jax.value_and_grad(stack)((xp, h0, wh, bh))
        return l + 0.0 * sum(s(t) for t in gr)

    variant = os.environ.get("SPEECH_TPU_GRU_DHP", "scratch")
    f = timeit(f"gru {layers}-layer fwd      [dhp={variant}]", fwd, xp, h0,
               wh, bh, steps=steps)
    fb = timeit(f"gru {layers}-layer fwd+bwd  [dhp={variant}]", fwdbwd, xp,
                h0, wh, bh, steps=steps)
    print(f"  -> per-layer net: fwd {(f - null) / layers * 1e3:.2f} ms, "
          f"bwd {(fb - f) / layers * 1e3:.2f} ms")
    print(f"(null overhead {null * 1e3:.1f} ms included in raw rows; "
          f"A/B the dhp staging by rerunning with SPEECH_TPU_GRU_DHP=concat)")


def hlo_mode(steps):
    """Dump the layout evidence for the conv-grad glue finding: compile the
    ReLU-composed l2 layer under both VJP impls and list every large copy /
    transpose in the optimized HLO with its layout annotation. With
    pallas_grads, ~100 MB {3,2,1,0}<->{3,0,2,1} transposing copies appear on
    the shared operands; with manual_dx they don't (the whole graph lives in
    the conv emitters' layout domain). See BASELINE.md round-5 campaign."""
    import re

    from speech_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal(L2_X), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal(L2_K) * 0.05, jnp.bfloat16)

    def s(v):
        return jnp.sum(v.astype(jnp.float32))

    for impl in ("manual_dx", "pallas_grads"):
        def f(x, k, impl=impl):
            def loss(args):
                xx, kk = args
                return s(jax.nn.relu(conv_ops.encoder_conv(
                    jax.nn.relu(xx), kk, 1, impl=impl)))
            l, gr = jax.value_and_grad(loss)((x, k))
            return l + 0.0 * (s(gr[0]) + s(gr[1]))

        txt = jax.jit(f).lower(x2, k2).compile().as_text()
        big = []
        for ln in txt.splitlines():
            ln = ln.strip()
            m = re.match(r".*= (bf16|f32)\[([0-9,]+)\][^ ]* (copy|transpose)\(",
                         ln)
            if m:
                dims = [int(d) for d in m.group(2).split(",") if d]
                if int(np.prod(dims)) > 2_000_000:
                    big.append(ln)
        print(f"===== {impl}: {len(big)} large copies/transposes")
        for ln in big:
            print("  ", ln[:150])


def step_mode(steps):
    """Full flagship train step = bench.py's exact program under the current
    env knobs (SPEECH_TPU_CONV_IMPL, SPEECH_TPU_GRU_DHP, BENCH_*)."""
    os.environ.setdefault("BENCH_STEPS", str(steps))
    import bench

    print(f"(conv_impl={os.environ.get('SPEECH_TPU_CONV_IMPL', 'manual_dx')},"
          f" gru_dhp={os.environ.get('SPEECH_TPU_GRU_DHP', 'scratch')})",
          flush=True)
    bench.main()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["conv", "gru", "step", "hlo"])
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache(None)
    print("platform:", jax.devices()[0].platform)
    if args.mode == "conv":
        conv_mode(args.steps)
    elif args.mode == "gru":
        gru_mode(args.steps)
    elif args.mode == "hlo":
        hlo_mode(args.steps)
    else:
        step_mode(args.steps)


if __name__ == "__main__":
    main()
