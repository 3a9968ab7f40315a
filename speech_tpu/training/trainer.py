"""Config-driven training: jitted SGD steps, epoch loop, dev eval, checkpoints.

Capability parity with the reference driver (reference train.py:21-121):
gradient-clip at 200 then SGD+momentum (train.py:32-35, 95-97), EMA train loss
with w=0.99 (train.py:41-42), per-epoch dev loss/CER (train.py:51-70),
best-checkpoint tagging on dev CER improvement (train.py:109-121), and the
model-vs-data wall-clock split in the progress display (train.py:23-46).

TPU-first differences: the whole optimizer step (forward, CTC lattice,
backward, clip, update) is one jitted XLA program with donated buffers; the
loop syncs with the device only every ``log_every`` steps so input prefetch
overlaps compute; training is resumable (see training.checkpoint); batch-mean
loss (the reference's warp-ctc sums over the batch — recipe learning rates
account for this).
"""

from __future__ import annotations

import functools
import random
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_tpu.data.loader import Loader, make_loader
from speech_tpu.data.preprocessor import Preprocessor
from speech_tpu.decode import ctc_greedy_decode
from speech_tpu.models import build_model
from speech_tpu.training import checkpoint as ckpt
from speech_tpu.training.metrics import MetricsLogger
from speech_tpu.utils.score import compute_cer

DEFAULT_GRAD_CLIP = 200.0  # reference train.py:32


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Point XLA's persistent compilation cache at a stable directory so the
    per-bucket-shape jit programs compile once ever, not once per run.
    Length-bucketed static shapes (data.time_mult/label_mult) keep the shape
    set small; this keeps repeat runs from paying even that."""
    import os

    path = path or os.environ.get(
        "SPEECH_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/speech_tpu/xla_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_optimizer(opt_cfg: dict) -> optax.GradientTransformation:
    """Optimizer from the config ``optimizer`` section.

    ``name``: "sgd" (reference default, train.py:95-97) or "adam" —
    CTC/RNN-T blank-collapse escapes far faster under Adam. Optional
    ``warmup_steps`` ramps the lr linearly from 0, and ``decay_steps`` adds a
    cosine decay to ``learning_rate * min_lr_ratio`` (default 0.01) after the
    warmup — Adam at a flat lr can blow up mid-run on attention decoders.
    ``grad_clip`` defaults to the reference's 200 (train.py:32)."""
    lr = opt_cfg["learning_rate"]
    momentum = opt_cfg.get("momentum", 0.0)
    clip = opt_cfg.get("grad_clip", DEFAULT_GRAD_CLIP)
    warmup = opt_cfg.get("warmup_steps", 0)
    decay = opt_cfg.get("decay_steps", 0)
    if decay:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else lr, peak_value=lr,
            warmup_steps=warmup, decay_steps=decay,
            end_value=lr * opt_cfg.get("min_lr_ratio", 0.01))
    elif warmup:
        lr = optax.linear_schedule(0.0, lr, warmup)
    name = opt_cfg.get("name", "sgd")
    if name == "adam":
        opt = optax.adam(lr, b1=opt_cfg.get("beta1", 0.9),
                         b2=opt_cfg.get("beta2", 0.999))
    elif name == "sgd":
        opt = optax.sgd(lr, momentum=momentum if momentum else None)
    else:
        raise ValueError(f"unknown optimizer {name!r}; have sgd, adam")
    tx = optax.chain(optax.clip_by_global_norm(clip), opt)
    if opt_cfg.get("fused", False):
        tx = fuse_optimizer(tx)
    return tx


def fuse_optimizer(tx: optax.GradientTransformation
                   ) -> optax.GradientTransformation:
    """Run an optax transformation over ONE raveled vector instead of the
    param tree (config ``optimizer.fused: true``).

    The per-leaf update emits ~5 elementwise passes over each of the ~26
    parameter leaves; on a v5e the flagship step spent ~15 ms there against
    a <1 ms HBM-bandwidth roofline (BASELINE.md breakdown). Flattening turns
    it into a handful of full-width vector ops. The optimizer state becomes a
    single vector (checkpoints remain self-consistent per config; don't flip
    this flag mid-run on a resumed optimizer state)."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(flat)

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        flat_u, state = tx.update(flat_g, state, flat_p)
        return unravel(flat_u), state

    return optax.GradientTransformation(init, update)


def make_train_step(model, tx, frontend: Optional[Callable] = None) -> Callable:
    """Build the jitted training step: loss, grads, clip, SGD update.

    ``frontend``: optional on-device featurization (data.frontend.
    OnDeviceFrontend) mapping a raw-waveform batch to a feature batch INSIDE
    the jitted program."""

    def loss_fn(params, batch, rng):
        k_drop, k_sample = jax.random.split(rng)
        return model.apply({"params": params}, batch, True, method="loss",
                           rngs={"dropout": k_drop, "sample": k_sample})

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        if frontend is not None:
            batch = frontend(batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grad_norm

    return step


def make_eval_step(model, max_len: int = 200,
                   frontend: Optional[Callable] = None) -> Callable:
    """Jitted dev-eval step per model family: PER-UTTERANCE losses (B,) plus
    the greedy-decode tensors, one compiled program per bucket shape (the
    reference's dev eval is an eager forward per use, train.py:51-70).
    Returns ``step(params, batch) -> (losses, decoded)`` where ``decoded``
    feeds :func:`postprocess_decoded`; with a pad_last loader, slice both by
    the batch's ``_n_valid``."""
    from speech_tpu.models.seq2seq import Seq2SeqModel
    from speech_tpu.models.transducer import TransducerModel

    fe = frontend if frontend is not None else (lambda b: b)
    if isinstance(model, TransducerModel):
        @jax.jit
        def step(params, batch):
            batch = fe(batch)
            return model.apply({"params": params}, batch, max_out=max_len,
                               method="eval_outputs")
    elif isinstance(model, Seq2SeqModel):
        @jax.jit
        def step(params, batch):
            batch = fe(batch)
            return model.apply({"params": params}, batch, max_len,
                               method="eval_outputs")
    else:  # CTC: loss + log_probs share one encoder forward (eval_outputs)
        @jax.jit
        def step(params, batch):
            batch = fe(batch)
            loss, lp, lengths = model.apply({"params": params}, batch,
                                            method="eval_outputs")
            return loss, (lp, lengths)
    return step


def postprocess_decoded(model, decoded) -> list[list[int]]:
    """Host-side cleanup of a jitted greedy decode's raw tensors into
    per-utterance token lists (family-dispatched, matching infer_batch)."""
    from speech_tpu.models.seq2seq import Seq2SeqModel
    from speech_tpu.models.transducer import TransducerModel

    if isinstance(model, TransducerModel):
        out = np.asarray(decoded)
        return [row[row != model.blank].tolist() for row in out]
    if isinstance(model, Seq2SeqModel):
        out = []
        for row in np.asarray(decoded):
            toks = row.tolist()
            if model.end_idx in toks[1:]:
                toks = toks[: toks[1:].index(model.end_idx) + 2]
            out.append(toks)
        return out
    log_probs, lengths = decoded
    return ctc_greedy_decode(log_probs, lengths, blank=model.blank)


def init_params(model, input_dim: int, rng_key) -> Any:
    dummy_batch = {
        "inputs": jnp.zeros((1, 50, input_dim), jnp.float32),
        "input_lengths": jnp.asarray([50], jnp.int32),
        "labels": jnp.zeros((1, 8), jnp.int32),
        "label_lengths": jnp.asarray([8], jnp.int32),
    }
    variables = model.init(rng_key, dummy_batch, method="loss")
    return variables["params"]


def run_epoch(model, params, opt_state, train_step, loader: Loader,
              rng_key, it: int, avg_loss: float, logger: MetricsLogger,
              log_every: int = 10, verbose: bool = True,
              place_batch: Optional[Callable] = None, trace=None):
    """One epoch over the training loader (reference run_epoch, train.py:21-49).

    ``trace``: optional utils.profiling.TraceWindow capturing a device trace
    for a step window (SURVEY §5.1)."""
    model_t, data_t = 0.0, 0.0
    end_t = time.time()
    pending: list[tuple[int, Any, Any]] = []

    def drain():
        nonlocal avg_loss
        for it_i, loss_i, gn_i in pending:
            loss_f = float(loss_i)
            avg_loss = 0.99 * avg_loss + 0.01 * loss_f if it_i > 0 else loss_f
            logger.log_value("train_loss", loss_f, it_i)
            logger.log_value("grad_norm", float(gn_i), it_i)
        pending.clear()

    for batch in loader:
        start_t = time.time()
        data_t += start_t - end_t
        if place_batch is not None:
            batch = place_batch(batch)
        if trace is not None:
            trace.maybe_start(it)
        rng = jax.random.fold_in(rng_key, it)
        params, opt_state, loss, grad_norm = train_step(
            params, opt_state, batch, rng)
        if trace is not None and not trace.done:
            jax.block_until_ready(loss)
            trace.maybe_stop(it + 1)
        pending.append((it, loss, grad_norm))
        it += 1
        if len(pending) >= log_every:
            drain()  # forces device sync; keeps the queue shallow
        end_t = time.time()
        model_t += end_t - start_t
    start_t = time.time()
    drain()
    model_t += time.time() - start_t
    if verbose:
        print(f"  model time {model_t:.1f}s, data time {data_t:.1f}s, "
              f"avg_loss {avg_loss:.3f}")
    return params, opt_state, it, avg_loss, {"model_t": model_t, "data_t": data_t}


def make_infer_step(model, max_len: int = 200,
                    frontend: Optional[Callable] = None) -> Callable:
    """Jitted greedy-decode program for batch inference: ONE compiled XLA
    program per bucket shape, reused across the whole eval corpus (the
    reference dispatches model.infer eagerly per batch, eval.py:12-18).
    Returns ``step(params, batch) -> decoded`` for :func:`postprocess_decoded`.
    """
    from speech_tpu.models.seq2seq import Seq2SeqModel
    from speech_tpu.models.transducer import TransducerModel

    fe = frontend if frontend is not None else (lambda b: b)
    if isinstance(model, TransducerModel):
        @jax.jit
        def step(params, batch):
            return model.apply({"params": params}, fe(batch),
                               max_out=max_len, method="greedy")
    elif isinstance(model, Seq2SeqModel):
        @jax.jit
        def step(params, batch):
            return model.apply({"params": params}, fe(batch), max_len,
                               method="greedy")
    else:
        @jax.jit
        def step(params, batch):
            return model.apply({"params": params}, fe(batch),
                               method="log_probs")
    return step


def infer_batch(model, params, batch, max_len: int = 200,
                beam_size: int = 0, infer_step: Optional[Callable] = None,
                lm_logp=None) -> list[list[int]]:
    """Predictions for a batch, dispatched by model family. ``beam_size`` 0
    means greedy; >0 selects beam search where implemented. Pass a hoisted
    ``infer_step`` (make_infer_step) so greedy decode runs as one jitted
    program reused across batches. ``lm_logp`` is an optional dense bigram
    LM table for the CTC beam (decode.ctc_beam.ctc_beam_decode)."""
    from speech_tpu.models.seq2seq import Seq2SeqModel
    from speech_tpu.models.transducer import TransducerModel

    if beam_size == 0 and infer_step is not None:
        return postprocess_decoded(model, infer_step(params, batch))
    if isinstance(model, TransducerModel):
        if beam_size > 0:
            from speech_tpu.decode.rnnt_beam import rnnt_beam_search

            preds, _ = rnnt_beam_search(model, params, batch,
                                        beam_size=beam_size, max_out=max_len)
            return preds
        out = model.apply({"params": params}, batch, max_out=max_len,
                          method="greedy")
        return postprocess_decoded(model, out)
    if isinstance(model, Seq2SeqModel):
        if beam_size > 0:
            from speech_tpu.decode.seq2seq_beam import seq2seq_beam_search

            ys, _ = seq2seq_beam_search(model, params, batch,
                                        beam_size=beam_size, max_len=max_len)
        else:
            ys = model.apply({"params": params}, batch, max_len,
                             method="greedy")
        return postprocess_decoded(model, ys)
    if infer_step is not None:
        # the CTC infer step IS the jitted log_probs program — use it for
        # the beam path too (the eager model.apply dispatches the whole
        # encoder op-by-op, which dominates beam-eval wall time on
        # remote/tunneled devices)
        log_probs, lengths = infer_step(params, batch)
    else:
        log_probs, lengths = model.apply({"params": params}, batch,
                                         method="log_probs")
    if beam_size > 0:
        from speech_tpu.decode.ctc_beam import ctc_beam_decode

        labels, _ = ctc_beam_decode(log_probs, lengths, beam_size=beam_size,
                                    blank=model.blank, lm_logp=lm_logp)
        return labels
    return postprocess_decoded(model, (log_probs, lengths))


def eval_dev(model, params, loader: Loader, preproc: Preprocessor,
             eval_step=None, verbose: bool = True):
    """Dev loss + corpus CER (reference eval_dev, train.py:51-70).

    Runs one jitted loss+greedy-decode program per bucket shape
    (make_eval_step); loss is averaged per UTTERANCE, not per batch, so
    drop_last=False final batches do not bias it."""
    if eval_step is None:
        eval_step = make_eval_step(model)
    loss_sum, n_utts = 0.0, 0
    results = []
    for batch in loader:
        n_valid = batch.pop("_n_valid", None)  # pad_last loaders (one shape)
        losses, decoded = eval_step(params, batch)
        preds = postprocess_decoded(model, decoded)
        b = len(preds) if n_valid is None else n_valid
        loss_sum += float(np.asarray(losses)[:b].sum())  # per-utterance
        n_utts += b
        for i in range(b):
            u = int(batch["label_lengths"][i])
            label = batch["labels"][i, :u].tolist()
            results.append((label, preds[i]))
    avg_loss = loss_sum / n_utts if n_utts else float("nan")
    results = [(preproc.decode(l), preproc.decode(p)) for l, p in results]
    cer = compute_cer(results)
    if verbose:
        print(f"  dev loss {avg_loss:.3f}, dev cer {cer:.3f}")
    return avg_loss, cer


def opt_layout_tag(opt_cfg: dict) -> str:
    """Layout tag persisted with the opt state so a resume can assert the
    ``optimizer.fused`` flag didn't flip (fused = one raveled vector, tree =
    per-leaf optax state — restoring one into the other corrupts the run)."""
    return "fused" if opt_cfg.get("fused", False) else "tree"


def save_checkpoint_synced(save_path: str, params, opt_state, preproc,
                           config: dict, *, step: int, epoch: int,
                           best_so_far: float, is_best: bool) -> None:
    """Single-writer checkpoint + barrier (multi-host safe).

    With N processes on a shared filesystem, concurrent writes to the same
    npz/json (and their identically-named .tmp files) would race — only
    process 0 writes; every process then waits at the barrier so nobody can
    run ahead into the next epoch (or a resume) against a half-written
    checkpoint. Covered by the 2-process test (tests/_mp_worker.py)."""
    if jax.process_index() == 0:
        ckpt.save_train_state(save_path, jax.device_get(params),
                              jax.device_get(opt_state), preproc, config,
                              step=step, epoch=epoch, best_so_far=best_so_far,
                              opt_layout=opt_layout_tag(
                                  config.get("optimizer", {})))
        if is_best:
            from speech_tpu.utils import io as model_io

            model_io.save(save_path, jax.device_get(params), preproc,
                          config, tag="best")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_epoch_{epoch}")


def run(config: dict, resume: bool = False, verbose: bool = True) -> dict:
    """Full training run from a config dict (reference run, train.py:72-121).

    Returns a summary dict with the best dev CER and final step count.
    """
    seed = config.get("seed", 2017)
    random.seed(seed)
    np.random.seed(seed)
    if config.get("compilation_cache", True):
        enable_compilation_cache(config.get("compilation_cache_dir"))

    data_cfg = config["data"]
    opt_cfg = config["optimizer"]
    save_path = config["save_path"]

    # Multi-host first: process topology decides the input sharding below.
    par_cfg = config.get("parallel", {})
    if par_cfg.get("enabled", False) and par_cfg.get("multihost", False):
        jax.distributed.initialize()

    feat_cfg = data_cfg.get("features", {})
    preproc = Preprocessor(data_cfg["train_set"],
                           start_and_end=data_cfg.get("start_and_end", True),
                           seed=seed,
                           feature_type=feat_cfg.get("type", "logspec"),
                           n_mels=feat_cfg.get("n_mels", 0))
    batch_size = opt_cfg["batch_size"]
    on_device_features = data_cfg.get("on_device_features", False)
    loader_kwargs = dict(
        time_mult=data_cfg.get("time_mult", 100),
        label_mult=data_cfg.get("label_mult", 8),
        num_workers=data_cfg.get("num_workers", 4),
        seed=seed,
        raw_audio=on_device_features,
    )
    # Per-host input sharding (SURVEY §2.2 DP row): the train loader on each
    # host featurizes only its slice of every global batch; batch order stays
    # in lockstep (same seed). Dev stays unsharded so every host computes
    # identical dev metrics and checkpoint decisions never diverge.
    proc_shard = (jax.process_index(), jax.process_count())
    train_ldr = make_loader(data_cfg["train_set"], preproc, batch_size,
                            process_shard=proc_shard, **loader_kwargs)
    dev_ldr = make_loader(data_cfg["dev_set"], preproc, batch_size,
                          drop_last=False, pad_last=True, **loader_kwargs)

    # Greedy-decode budget for eval (seq2seq/transducer label scans): config
    # ``model.max_decode_len`` wins; otherwise default from the train
    # manifest's max label length (+ headroom) — a fixed 200 silently
    # truncates WSJ-length character transcripts. Written back into the
    # config so it travels with the checkpoint and eval.py uses the same
    # budget.
    if "max_decode_len" not in config["model"]:
        off = 2 if data_cfg.get("start_and_end", True) else 0
        max_u = max(len(d["text"]) for d in train_ldr.dataset.data) + off
        config["model"]["max_decode_len"] = int(max_u + 10)
    max_decode_len = int(config["model"]["max_decode_len"])

    model = build_model(config["model"], preproc)
    tx = make_optimizer(opt_cfg)
    key = jax.random.PRNGKey(seed)
    params = init_params(model, preproc.input_dim, key)
    opt_state = tx.init(params)

    # Optional mesh parallelism (config "parallel" section; SURVEY §2.2).
    mesh = None
    if par_cfg.get("enabled", False):
        from speech_tpu.parallel import make_mesh
        from speech_tpu.parallel.mesh import replicated

        mesh = make_mesh(n_data=par_cfg.get("n_data"),
                         n_model=par_cfg.get("n_model", 1))
        if batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis "
                f"{mesh.shape['data']}")
        if mesh.shape.get("model", 1) > 1:
            from speech_tpu.parallel.tp import shard_params

            params = shard_params(params, mesh)  # TP weight shardings
        else:
            params = jax.device_put(params, replicated(mesh))
        opt_state = tx.init(params)  # inherits the param shardings

    start_epoch, it, best_so_far = 0, 0, float("inf")
    if resume and ckpt.has_train_state(save_path):
        params, opt_state, state = ckpt.restore_train_state(
            save_path, opt_state, expect_opt_layout=opt_layout_tag(opt_cfg))
        start_epoch = state["epoch"] + 1
        it = state["step"]
        best_so_far = state["best_so_far"]
        if verbose:
            print(f"resumed from {save_path} at epoch {start_epoch}, step {it}")

    frontend = None
    if on_device_features:
        from speech_tpu.data.frontend import OnDeviceFrontend

        frontend = OnDeviceFrontend(preproc, train_ldr._sample_rate())
    if mesh is not None:
        from speech_tpu.parallel import make_parallel_train_step, shard_batch

        train_step = make_parallel_train_step(model, tx, mesh, params=params,
                                              frontend=frontend)
        place_batch = lambda b: shard_batch(b, mesh)
    else:
        train_step = make_train_step(model, tx, frontend=frontend)
        place_batch = None
    # hoisted: jit cache lives across epochs
    eval_step = make_eval_step(model, max_len=max_decode_len,
                               frontend=frontend)
    avg_loss = 0.0
    summary = {"best_dev_cer": best_so_far, "steps": it, "epochs_run": 0}

    from speech_tpu.utils.profiling import make_trace_window
    trace = make_trace_window(config.get("profile"), save_path)

    with MetricsLogger(save_path, tensorboard=config.get("tensorboard", False)) as logger:
        for epoch in range(start_epoch, opt_cfg["epochs"]):
            epoch_key = jax.random.fold_in(key, 1000 + epoch)
            start = time.time()
            if verbose:
                print(f"epoch {epoch}")
            params, opt_state, it, avg_loss, times = run_epoch(
                model, params, opt_state, train_step, train_ldr, epoch_key,
                it, avg_loss, logger, verbose=verbose,
                place_batch=place_batch, trace=trace)
            logger.log_value("epoch_time", time.time() - start, epoch)
            logger.log_value("model_time", times["model_t"], epoch)
            logger.log_value("data_time", times["data_t"], epoch)

            eval_start = time.time()
            if mesh is not None:
                from speech_tpu.parallel.eval import distributed_eval

                dev_loss, dev_cer = distributed_eval(model, params, dev_ldr,
                                                     preproc, mesh,
                                                     frontend=frontend)
                if verbose:
                    print(f"  dev loss {dev_loss:.3f}, dev cer {dev_cer:.3f}")
            else:
                dev_loss, dev_cer = eval_dev(model, params, dev_ldr, preproc,
                                             eval_step=eval_step,
                                             verbose=verbose)
            logger.log_value("dev_loss", dev_loss, epoch)
            logger.log_value("dev_cer", dev_cer, epoch)
            logger.log_value("dev_eval_time", time.time() - eval_start, epoch)

            best_so_far = min(best_so_far, dev_cer)
            save_checkpoint_synced(save_path, params, opt_state, preproc,
                                   config, step=it, epoch=epoch,
                                   best_so_far=best_so_far,
                                   is_best=dev_cer == best_so_far)
            summary.update(best_dev_cer=best_so_far, steps=it,
                           epochs_run=epoch - start_epoch + 1,
                           last_dev_loss=dev_loss, last_dev_cer=dev_cer,
                           avg_loss=avg_loss)
    if trace is not None:
        trace.close()
    return summary
