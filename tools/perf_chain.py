"""Chained component timings of the flagship step (tunnel-honest).

tools/perf_breakdown.py fetches a scalar per iteration, which on this
machine's tunneled TPU adds a ~26 ms round trip to EVERY number (visible as
"ctc fwd" == "ctc fwd+bwd" there), and its value_and_grad probe returned only
the loss, letting XLA dead-code-eliminate the whole backward pass. This tool
fixes both: each timed program is CHAINED (step k+1's input depends on step
k's output, so the device serializes the work with no host sync) and the
chain is fetched ONCE at the end; gradient probes return a reduction over the
full gradient tree so nothing is DCE'd.

Usage: python tools/perf_chain.py [--batch 64] [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import FLAGSHIP_MODEL_CFG, _Spec, _fake_batch
from speech_tpu.models import build_model
from speech_tpu.training.trainer import make_optimizer, make_train_step


def time_chain(name, fn, scalar_of, init_carry, steps=10):
    """fn: jitted carry -> carry; scalar_of: jitted carry -> f32 scalar (the
    sync probe). Times ``steps`` chained applications, syncing every 2 steps
    (this box's tunnel hits a pathological slow path on deep async queues —
    see bench.py — so the queue is kept at <=2 like the bench protocol; the
    ~26 ms fetch round trip amortizes to ~13 ms/step, subtract mentally).
    Continues from the post-compile carry (donation-safe: never reuses a
    buffer that a donating step already consumed)."""
    carry = fn(init_carry)  # compile
    _ = float(scalar_of(carry))  # sync
    t0 = time.perf_counter()
    for i in range(steps):
        carry = fn(carry)
        if i % 2 == 1:
            _ = float(scalar_of(carry))
    _ = float(scalar_of(carry))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--labels", type=int, default=160)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

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
          f"steps={args.steps}")

    # --- full train step, chained through (params, opt_state) ---
    tx = make_optimizer({"learning_rate": 1e-3, "momentum": 0.9})
    opt_state = jax.device_put(tx.init(params))
    raw_step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)

    def full_step(carry):
        p, o = carry
        p, o, loss, gn = raw_step(p, o, batch, key)
        return (p, o)

    # copies: raw_step donates its inputs
    p0 = jax.tree.map(jnp.copy, params)
    o0 = jax.tree.map(jnp.copy, opt_state)
    probe_po = jax.jit(lambda c: jnp.sum(
        jax.tree.leaves(c[0])[0].astype(jnp.float32)))
    time_chain("full train step", full_step, probe_po, (p0, o0),
               steps=args.steps)

    # --- loss fwd + REAL bwd (grad tree fully consumed), chained ---
    def loss_of(p):
        return model.apply({"params": p}, batch, method="loss")

    @jax.jit
    def fwd_bwd(carry):
        p, acc = carry
        loss, grads = jax.value_and_grad(loss_of)(p)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return (p, acc + loss + 0.0 * gsum)

    probe_acc = lambda c: c[1]
    time_chain("loss fwd+bwd (real)", fwd_bwd, probe_acc,
               (params, jnp.float32(0)), steps=args.steps)

    # --- loss fwd only, chained via accumulated scalar ---
    @jax.jit
    def fwd_only(carry):
        p, acc = carry
        return (p, acc + loss_of(p))

    time_chain("loss fwd only", fwd_only, probe_acc,
               (params, jnp.float32(0)), steps=args.steps)

    # --- fwd+bwd with conv gradient cut (stop_gradient after convs) ---
    from speech_tpu.ops import rnn as rnn_ops
    from speech_tpu.models.encoder import conv_out_lengths

    def conv_apply(p, x):
        x = x.astype(dtype)[..., None]
        for i in range(len(model.encoder.conv)):
            cp = p["enc"][f"Conv_{i}"]
            s = model.encoder.conv[i][3]
            x = jax.lax.conv_general_dilated(
                x, cp["kernel"].astype(dtype), (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + cp["bias"].astype(dtype)
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

    from speech_tpu.ops.ctc import ctc_loss_auto

    def head_loss(p, enc, lens):
        fc = p["fc"]
        logits = (enc @ fc["kernel"].astype(dtype) + fc["bias"].astype(dtype))
        return ctc_loss_auto(logits.astype(jnp.float32), lens,
                             batch["labels"], batch["label_lengths"]).mean()

    lens_out = conv_out_lengths(model.encoder.conv, batch["input_lengths"])

    def loss_nocvgrad(p):
        enc = jax.lax.stop_gradient(conv_apply(p, batch["inputs"]))
        x = gru_stack_apply(p, enc, lens_out)
        return head_loss(p, x, lens_out)

    @jax.jit
    def fwd_bwd_nocv(carry):
        p, acc = carry
        loss, grads = jax.value_and_grad(loss_nocvgrad)(p)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return (p, acc + loss + 0.0 * gsum)

    time_chain("fwd+bwd, conv grad cut", fwd_bwd_nocv, probe_acc,
               (params, jnp.float32(0)), steps=args.steps)

    # --- conv fwd alone / conv fwd+bwd alone, chained via input nudge ---
    x_in = batch["inputs"]

    @jax.jit
    def conv_fwd(carry):
        x, acc = carry
        out = conv_apply(params, x)
        s = jnp.sum(out.astype(jnp.float32))
        return (x + 0.0 * s, acc + s)

    time_chain("conv stack fwd", conv_fwd, probe_acc,
               (x_in, jnp.float32(0)), steps=args.steps)

    @jax.jit
    def conv_fwd_bwd(carry):
        x, acc = carry
        def f(p):
            return jnp.sum(conv_apply(p, x).astype(jnp.float32))
        s, grads = jax.value_and_grad(f)(params)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return (x + 0.0 * s, acc + s + 0.0 * gsum)

    time_chain("conv stack fwd+bwd", conv_fwd_bwd, probe_acc,
               (x_in, jnp.float32(0)), steps=args.steps)

    # --- GRU stack fwd / fwd+bwd on conv-shaped activations ---
    t_out = model.conv_out_size(args.frames, 0)
    f_out = model.conv_out_size(_Spec.input_dim, 1)
    c_out = model.encoder.conv[-1][0]
    gin = jax.device_put(jnp.asarray(
        rng.standard_normal((args.batch, t_out, f_out * c_out)), dtype))
    glens = jnp.full((args.batch,), t_out, jnp.int32)

    @jax.jit
    def gru_fwd(carry):
        x, acc = carry
        out = gru_stack_apply(params, x, glens)
        s = jnp.sum(out.astype(jnp.float32))
        return (x + 0.0 * s.astype(x.dtype), acc + s)

    time_chain("gru stack fwd", gru_fwd, probe_acc,
               (gin, jnp.float32(0)), steps=args.steps)

    @jax.jit
    def gru_fwd_bwd(carry):
        x, acc = carry
        def f(p):
            return jnp.sum(gru_stack_apply(p, x, glens).astype(jnp.float32))
        s, grads = jax.value_and_grad(f)(params)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return (x + 0.0 * s.astype(x.dtype), acc + s + 0.0 * gsum)

    time_chain("gru stack fwd+bwd", gru_fwd_bwd, probe_acc,
               (gin, jnp.float32(0)), steps=args.steps)

    # --- CTC loss fwd / fwd+bwd on random logits ---
    logits = jax.device_put(jnp.asarray(rng.standard_normal(
        (args.batch, t_out, _Spec.vocab_size + 1)), jnp.float32))
    llens = jnp.full((args.batch,), t_out, jnp.int32)

    @jax.jit
    def ctc_fwd(carry):
        lg, acc = carry
        s = ctc_loss_auto(lg, llens, batch["labels"],
                          batch["label_lengths"]).mean()
        return (lg + 0.0 * s, acc + s)

    time_chain("ctc loss fwd", ctc_fwd, probe_acc,
               (logits, jnp.float32(0)), steps=args.steps)

    @jax.jit
    def ctc_fwd_bwd(carry):
        lg, acc = carry
        s, g = jax.value_and_grad(
            lambda l: ctc_loss_auto(l, llens, batch["labels"],
                                    batch["label_lengths"]).mean())(lg)
        return (lg + 0.0 * s + 0.0 * g.astype(lg.dtype) * 0.0,
                acc + s + 0.0 * jnp.sum(g))

    time_chain("ctc loss fwd+bwd", ctc_fwd_bwd, probe_acc,
               (logits, jnp.float32(0)), steps=args.steps)


if __name__ == "__main__":
    main()
