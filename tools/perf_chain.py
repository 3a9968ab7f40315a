"""Component timings of the flagship step with real backward passes.

tools/perf_breakdown.py had two measurement bugs on this machine: (a) its
value_and_grad probes returned only the loss, letting XLA dead-code-eliminate
the whole backward pass ("ctc fwd" == "ctc fwd+bwd" there), and (b) every
number carries the tunnel's dispatch+fetch overhead. This tool fixes (a) by
returning ``loss + 0 * sum(grads)`` so nothing is DCE'd, and quantifies (b)
with a null-program baseline to subtract. The measurement loop is the
bench.py protocol exactly — fetch the scalar result every OTHER step — which
is the only pattern that behaves on this tunnel (block_until_ready does not
synchronize, and queues deeper than ~2 hit a pathological slow path that
hangs chained programs entirely).

Usage: python tools/perf_chain.py [--batch 64] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import FLAGSHIP_MODEL_CFG, _Spec, _fake_batch
from speech_tpu.models import build_model
from speech_tpu.training.trainer import (enable_compilation_cache,
                                         make_optimizer, make_train_step)


def timeit(name, fn, *args, steps=10):
    """fn(*args) -> f32 scalar depending on ALL work to be timed. Fetches the
    scalar every other step (bench.py protocol; see module doc)."""
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
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def grad_probe(loss_fn):
    """jit of params -> loss + 0 * sum(grads): backward can't be DCE'd."""
    @jax.jit
    def f(p, *rest):
        loss, grads = jax.value_and_grad(loss_fn)(p, *rest)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return loss.astype(jnp.float32) + 0.0 * gsum
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--labels", type=int, default=160)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    enable_compilation_cache()

    cfg = dict(FLAGSHIP_MODEL_CFG, dtype=args.dtype)
    model = build_model(cfg, _Spec())
    rng = np.random.default_rng(0)
    batch = _fake_batch(rng, b=args.batch, t=args.frames, u=args.labels,
                        vocab=_Spec.vocab_size)
    params = model.init(jax.random.PRNGKey(0), batch["inputs"][:1],
                        batch["input_lengths"][:1])["params"]
    batch = jax.device_put(batch)
    params = jax.device_put(params)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    print(f"batch={args.batch} frames={args.frames} dtype={args.dtype} "
          f"steps={args.steps}", flush=True)

    # --- null program: pure dispatch+fetch overhead of this protocol ---
    null = jax.jit(lambda x: x + 1.0)
    timeit("null op (protocol overhead)", null, jnp.float32(0),
           steps=args.steps)

    # --- full train step: EXACT bench.py loop (donation + rebind) ---
    tx = make_optimizer({"learning_rate": 1e-3, "momentum": 0.9})
    opt_state = jax.device_put(tx.init(jax.device_get(params)))
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    p, o, loss, gn = step(p, o, batch, key)  # compile
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(args.steps):
        p, o, loss, gn = step(p, o, batch, key)
        if i % 2 == 1:
            _ = float(loss)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"{'full train step':34s} {dt * 1e3:9.2f} ms", flush=True)
    del p, o

    # --- model loss: forward only, then forward+real backward ---
    def loss_of(p):
        return model.apply({"params": p}, batch, method="loss")

    timeit("loss fwd only", jax.jit(
        lambda p: loss_of(p).astype(jnp.float32)), params, steps=args.steps)
    timeit("loss fwd+bwd (real)", grad_probe(loss_of), params,
           steps=args.steps)

    # --- same with the conv gradient cut out (isolates conv backward) ---
    from speech_tpu.models.encoder import conv_out_lengths
    from speech_tpu.ops import rnn as rnn_ops
    from speech_tpu.ops.ctc import ctc_loss_auto

    def conv_apply(p, x):
        x = x.astype(dtype)[..., None]
        for i, (out_c, kh, kw, s) in enumerate(model.encoder.conv):
            cp = p["enc"][f"Conv_{i}"]
            x = jax.lax.conv_general_dilated(
                x, cp["kernel"].astype(dtype), (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) \
                + cp["bias"].astype(dtype)
            x = jax.nn.relu(x)
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)

    def gru_stack_apply(p, x, lens):
        for i in range(model.encoder.rnn_layers):
            g = p["enc"][f"gru_{i}"]
            w = [jnp.stack([g["fwd_wi"], g["bwd_wi"]]),
                 jnp.stack([g["fwd_bi"], g["bwd_bi"]]),
                 jnp.stack([g["fwd_wh"], g["bwd_wh"]]),
                 jnp.stack([g["fwd_bh"], g["bwd_bh"]])]
            x = rnn_ops.gru_sequence_bidir(x, lens, *w)
        half = x.shape[-1] // 2
        return x[..., :half] + x[..., half:]

    lens_out = conv_out_lengths(model.encoder.conv, batch["input_lengths"])

    def head_loss(p, enc):
        fc = p["fc"]
        logits = enc @ fc["kernel"].astype(dtype) + fc["bias"].astype(dtype)
        return ctc_loss_auto(logits.astype(jnp.float32), lens_out,
                             batch["labels"], batch["label_lengths"]).mean()

    def loss_conv_cut(p):
        enc = jax.lax.stop_gradient(conv_apply(p, batch["inputs"]))
        return head_loss(p, gru_stack_apply(p, enc, lens_out))

    timeit("fwd+bwd, conv grad cut", grad_probe(loss_conv_cut), params,
           steps=args.steps)

    # --- conv stack alone ---
    timeit("conv stack fwd", jax.jit(
        lambda p: jnp.sum(conv_apply(p, batch["inputs"]).astype(jnp.float32))),
        params, steps=args.steps)
    timeit("conv stack fwd+bwd", grad_probe(
        lambda p: jnp.sum(conv_apply(p, batch["inputs"]).astype(jnp.float32))),
        params, steps=args.steps)

    # --- GRU stack alone (on conv-shaped activations) ---
    t_out = model.conv_out_size(args.frames, 0)
    f_out = model.conv_out_size(_Spec.input_dim, 1)
    c_out = model.encoder.conv[-1][0]
    gin = jax.device_put(jnp.asarray(
        rng.standard_normal((args.batch, t_out, f_out * c_out)), dtype))
    glens = jnp.full((args.batch,), t_out, jnp.int32)

    timeit("gru stack fwd", jax.jit(
        lambda p: jnp.sum(gru_stack_apply(p, gin, glens).astype(jnp.float32))),
        params, steps=args.steps)
    timeit("gru stack fwd+bwd", grad_probe(
        lambda p: jnp.sum(gru_stack_apply(p, gin, glens).astype(jnp.float32))),
        params, steps=args.steps)

    # one bidir GRU layer, pallas vs pure scan
    g0 = params["enc"]["gru_1"]
    w1 = [jnp.stack([g0["fwd_wi"], g0["bwd_wi"]]),
          jnp.stack([g0["fwd_bi"], g0["bwd_bi"]]),
          jnp.stack([g0["fwd_wh"], g0["bwd_wh"]]),
          jnp.stack([g0["fwd_bh"], g0["bwd_bh"]])]
    gin2 = jax.device_put(jnp.asarray(
        rng.standard_normal((args.batch, t_out, 1024)), dtype))
    for impl in ("pallas", "pure"):
        timeit(f"gru layer fwd ({impl})", jax.jit(
            lambda x, im=impl: jnp.sum(rnn_ops.gru_sequence_bidir(
                x, glens, *w1, impl=im).astype(jnp.float32))),
            gin2, steps=args.steps)
        timeit(f"gru layer fwd+bwd ({impl})", grad_probe(
            lambda x, im=impl: jnp.sum(rnn_ops.gru_sequence_bidir(
                x, glens, *w1, impl=im).astype(jnp.float32))),
            gin2, steps=args.steps)

    # --- CTC loss alone ---
    logits = jax.device_put(jnp.asarray(rng.standard_normal(
        (args.batch, t_out, _Spec.vocab_size + 1)), jnp.float32))

    timeit("ctc loss fwd", jax.jit(
        lambda lg: ctc_loss_auto(lg, glens, batch["labels"],
                                 batch["label_lengths"]).mean()),
        logits, steps=args.steps)
    timeit("ctc loss fwd+bwd", grad_probe(
        lambda lg: ctc_loss_auto(lg, glens, batch["labels"],
                                 batch["label_lengths"]).mean()),
        logits, steps=args.steps)


if __name__ == "__main__":
    main()
