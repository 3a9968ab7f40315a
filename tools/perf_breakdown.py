"""Component-level wall-clock breakdown of the flagship training step.

Times jitted sub-programs of the flagship CTC model independently (loss-only
forward, encoder forward, GRU stack alone, conv stack alone, CTC loss alone,
full value_and_grad step) so the throughput work knows exactly where the
milliseconds go without needing trace-viewer tooling. Each timing syncs by
fetching a scalar (this machine's tunneled TPU does not synchronize on
block_until_ready — see bench.py).

Usage: python tools/perf_breakdown.py [--batch 64] [--frames 1000] [--steps 10]
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


def timeit(name, fn, *args, steps=10):
    out = fn(*args)  # compile
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
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

    # --- full train step ---
    tx = make_optimizer({"learning_rate": 1e-3, "momentum": 0.9})
    opt_state = jax.device_put(tx.init(params))
    raw_step = make_train_step(model, tx)

    def full_step(p, o, b):  # don't donate across repeats
        return raw_step(jax.tree.map(jnp.copy, p), jax.tree.map(jnp.copy, o),
                        b, jax.random.PRNGKey(1))[2]

    # --- loss-only forward ---
    loss_fwd = jax.jit(lambda p, b: model.apply({"params": p}, b, method="loss"))

    # --- loss + grad (no optimizer) ---
    grad_fn = jax.jit(lambda p, b: jax.value_and_grad(
        lambda q: model.apply({"params": q}, b, method="loss"))(p)[0])

    # --- encoder forward only ---
    enc_fwd = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["inputs"], b["input_lengths"])[0].sum())

    # --- conv stack only (encoder without GRUs) ---
    from speech_tpu.models.encoder import conv_out_lengths

    def conv_only(p, b):
        import flax.linen as nn
        x = b["inputs"].astype(dtype)[..., None]
        for i, (out_c, kh, kw, s) in enumerate(model.encoder.conv):
            cp = p["enc"][f"Conv_{i}"]
            x = jax.lax.conv_general_dilated(
                x, cp["kernel"].astype(dtype), (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + cp["bias"].astype(dtype)
            x = jax.nn.relu(x)
        return x.sum()
    conv_fwd = jax.jit(conv_only)

    # --- GRU stack only (on conv-shaped activations) ---
    from speech_tpu.ops import rnn as rnn_ops

    t_out = model.conv_out_size(args.frames, 0)
    f_out = model.conv_out_size(_Spec.input_dim, 1)
    c_out = model.encoder.conv[-1][0]
    gin = jnp.asarray(rng.standard_normal(
        (args.batch, t_out, f_out * c_out)), dtype)
    lens = jnp.full((args.batch,), t_out, jnp.int32)

    def gru_stack(p, x):
        for i in range(model.encoder.rnn_layers):
            g = p["enc"][f"gru_{i}"]
            w = [jnp.stack([g["fwd_wi"], g["bwd_wi"]]),
                 jnp.stack([g["fwd_bi"], g["bwd_bi"]]),
                 jnp.stack([g["fwd_wh"], g["bwd_wh"]]),
                 jnp.stack([g["fwd_bh"], g["bwd_bh"]])]
            x = rnn_ops.gru_sequence_bidir(x, lens, *w)
        return x.sum()
    gru_fwd = jax.jit(gru_stack)
    gru_grad = jax.jit(lambda p, x: jax.grad(
        lambda q: gru_stack(q, x))(p)["enc"]["gru_0"]["fwd_wh"].sum())

    # --- one GRU layer, pure-scan vs pallas ---
    g0 = jax.tree.map(lambda v: v, params["enc"]["gru_0"])
    w0 = [jnp.stack([g0["fwd_wi"], g0["bwd_wi"]]),
          jnp.stack([g0["fwd_bi"], g0["bwd_bi"]]),
          jnp.stack([g0["fwd_wh"], g0["bwd_wh"]]),
          jnp.stack([g0["fwd_bh"], g0["bwd_bh"]])]
    one_pallas = jax.jit(lambda x: rnn_ops.gru_sequence_bidir(
        x, lens, *w0, impl="pallas").sum())
    one_scan = jax.jit(lambda x: rnn_ops.gru_sequence_bidir(
        x, lens, *w0, impl="pure").sum())

    # --- CTC loss only (on random logits) ---
    from speech_tpu.ops.ctc import ctc_loss_auto

    logits = jnp.asarray(rng.standard_normal(
        (args.batch, t_out, _Spec.vocab_size + 1)), jnp.float32)
    llens = jnp.full((args.batch,), t_out, jnp.int32)
    ctc_fwd = jax.jit(lambda lg: ctc_loss_auto(
        lg, llens, batch["labels"], batch["label_lengths"]).sum())
    ctc_grad = jax.jit(lambda lg: jax.grad(
        lambda l: ctc_loss_auto(l, llens, batch["labels"],
                                batch["label_lengths"]).sum())(lg).sum())

    print(f"batch={args.batch} frames={args.frames} dtype={args.dtype} "
          f"t_out={t_out} steps={args.steps}")
    s = args.steps
    timeit("conv stack fwd", conv_fwd, params, batch, steps=s)
    timeit("gru layer fwd (pallas)", one_pallas, gin, steps=s)
    timeit("gru layer fwd (scan)", one_scan, gin, steps=s)
    timeit("gru stack fwd (4 layers)", gru_fwd, params, gin, steps=s)
    timeit("gru stack fwd+bwd", gru_grad, params, gin, steps=s)
    timeit("ctc loss fwd", ctc_fwd, logits, steps=s)
    timeit("ctc loss fwd+bwd", ctc_grad, logits, steps=s)
    timeit("encoder fwd", enc_fwd, params, batch, steps=s)
    timeit("model loss fwd", loss_fwd, params, batch, steps=s)
    timeit("loss fwd+bwd", grad_fn, params, batch, steps=s)
    timeit("full train step", full_step, params, opt_state, batch, steps=s)


if __name__ == "__main__":
    main()
