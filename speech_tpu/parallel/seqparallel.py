"""Sequence (time-axis) parallelism for long audio: sharded conv + wavefront GRU.

The reference has no long-sequence strategy beyond strided convs and length
bucketing (reference: speech/models/model.py:21-23, speech/loader.py:94-107;
SURVEY §5.7). For audio too long for one chip's HBM, the TPU-native answer is
to shard the TIME axis across a mesh ``seq`` axis:

  * **Conv front-end**: a VALID time-conv needs ``kh - 1`` future frames past
    each shard boundary. Each device ``ppermute``s its leading frames to its
    left neighbor (halo exchange), convolves locally, and the results
    concatenate to exactly the unsharded conv output.
  * **GRU recurrence**: inherently sequential in time, so shards run as a
    WAVEFRONT: in stage k, device k scans its local chunk starting from the
    carry ``ppermute``d from device k-1's stage. A bidirectional layer runs
    both wavefronts simultaneously (forward left->right, backward
    right->left), so the pass costs one wavefront, not two. The win is
    activation MEMORY (each device holds T/K of the sequence) — the RNN
    analog of ring attention for a model that has no self-attention over
    audio (SURVEY §5.7).

All functions are pure and built on ``shard_map`` so they compose with jit
and autodiff. Exact parity with the unsharded encoder is tested on a virtual
8-device CPU mesh (tests/seqparallel_test.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _pvary(x, axes):
    """Mark ``x`` as device-varying over ``axes`` (shard_map carry typing)."""
    return jax.lax.pcast(x, axes, to="varying")


def make_seq_mesh(n_seq: int, devices=None) -> Mesh:
    """A 1-D mesh over the time axis."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if len(devices) < n_seq:
        raise ValueError(f"need {n_seq} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_seq]), ("seq",))


# ---------------------------------------------------------------------------
# Conv front-end with halo exchange
# ---------------------------------------------------------------------------


def conv_time_sharded(mesh: Mesh, x: jax.Array, kernel: jax.Array,
                      bias: jax.Array, stride: int) -> jax.Array:
    """VALID 2-D conv with the time axis sharded over mesh axis ``seq``.

    x: (B, T, F, C) with T divisible by (n_seq * stride); kernel
    (kh, kw, C, O). The freq axis is local (VALID over full F). Each shard
    needs ``kh - stride`` halo frames from its right neighbor; the last shard
    pads (those outputs fall off the true VALID output and are dropped).

    Returns (B, T_out, F_out, O) with T_out = conv_out_size(T) rows, time
    sharded the same way.
    """
    n = mesh.shape["seq"]
    kh = kernel.shape[0]
    t = x.shape[1]
    if t % (n * stride):
        raise ValueError(f"time {t} not divisible by n_seq*stride {n * stride}")
    local_t = t // n
    halo = kh - stride  # frames needed past the local chunk
    if halo >= local_t:
        raise ValueError(f"halo {halo} >= local chunk {local_t}; use fewer shards")
    # Per-shard VALID outputs tile the global VALID output exactly when each
    # shard starts at a multiple of stride (guaranteed by divisibility) and
    # processes local_t + halo frames.
    out_rows_full = (local_t + halo - kh) // stride + 1
    out_rows_last = (local_t - kh) // stride + 1

    def local(xs):
        idx = jax.lax.axis_index("seq")
        if halo > 0:
            # halo exchange: receive the first `halo` frames of the RIGHT
            # neighbor (the left send wraps; the last shard's wrap is zeroed
            # below)
            lead = jax.lax.ppermute(xs[:, :halo], "seq",
                                    [(i, (i - 1) % n) for i in range(n)])
            ext = jnp.concatenate([xs, lead], axis=1)  # (B, local_t+halo, F, C)
        else:
            ext = xs
        out = jax.lax.conv_general_dilated(
            ext, kernel, (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + bias
        # Last shard's wrapped halo is garbage; its trailing outputs are
        # beyond the global VALID range. Zero them so downstream masking by
        # true lengths stays exact.
        rows = jnp.arange(out.shape[1])
        keep = jnp.where(idx == n - 1, out_rows_last, out_rows_full)
        out = jnp.where(rows[None, :, None, None] < keep, out, 0)
        # Keep a fixed local width; global output is the concat of per-shard
        # valid rows. We keep out_rows_full rows per shard (zero-padded on the
        # last shard), so the caller sees ceil semantics per shard.
        return out

    spec_x = P(None, "seq", None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec_x,),
                     out_specs=spec_x)(x)


# ---------------------------------------------------------------------------
# Wavefront (bi)GRU over a time-sharded sequence
# ---------------------------------------------------------------------------


def _gru_chunk(x_proj, h0, wh, bh, reverse: bool, valid):
    """Scan one local chunk. x_proj (B, L, 3H) pre-projected inputs; valid
    (L,) bool — at invalid (pad) steps the carry passes through unchanged and
    the emitted state is zero, matching the unsharded length-aware path."""

    def step(h, xs):
        xp, v = xs
        hp = h @ wh + bh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        nn = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * nn + z * h
        h_new = jnp.where(v, h_new, h)
        return h_new, jnp.where(v, h_new, 0)

    xs = jnp.swapaxes(x_proj, 0, 1)  # (L, B, 3H)
    last, hs = jax.lax.scan(step, h0, (xs, valid), reverse=reverse, unroll=4)
    return last, jnp.swapaxes(hs, 0, 1)


def gru_seq_sharded(mesh: Mesh, x: jax.Array, wi: jax.Array, bi: jax.Array,
                    wh: jax.Array, bh: jax.Array, reverse: bool = False,
                    valid_len: int | None = None) -> jax.Array:
    """GRU over a time-sharded (B, T, D) batch; returns (B, T, H) sharded.

    Wavefront schedule: stage s computes shard s (or n-1-s when reversed),
    passing the final carry to the next shard with ``ppermute``. Weights are
    replicated. T must be divisible by n_seq. Sequences are assumed to span
    the full T (this is the long-audio path; short padded batches use the
    unsharded encoder), except that a STATIC ``valid_len`` may mark trailing
    rows as padding (e.g. the zero rows a sharded conv appends) — those steps
    pass the carry through and emit zeros, exactly like the unsharded
    length-aware reversal.
    """
    n = mesh.shape["seq"]
    h_dim = wh.shape[0]
    local_t = x.shape[1] // n
    per_utt = valid_len is not None and not isinstance(valid_len, int)
    vl_arg = (jnp.asarray(valid_len, jnp.int32) if per_utt
              else jnp.zeros((x.shape[0],), jnp.int32))  # placeholder

    def local(xs, vl, wi, bi, wh, bh):
        idx = jax.lax.axis_index("seq")
        b = xs.shape[0]
        x_proj = xs @ wi + bi  # big MXU matmul, fully parallel across shards
        my_stage = (n - 1 - idx) if reverse else idx
        if valid_len is None:
            # pvary: constants are unvarying; the scan carry is varying.
            valid = _pvary(jnp.ones((local_t, 1, 1), bool), ("seq",))
        elif per_utt:
            # per-utterance lengths (B,): pad steps pass the carry through and
            # emit zeros, matching the unsharded length-aware GRU exactly
            pos = idx * local_t + jnp.arange(local_t)
            valid = (pos[:, None] < vl[None, :])[:, :, None]  # (L, B, 1)
        else:
            pos = idx * local_t + jnp.arange(local_t)  # idx is already varying
            valid = (pos < valid_len)[:, None, None]

        def stage(s, carry):
            h, out = carry
            last, hs = _gru_chunk(x_proj, h, wh, bh, reverse, valid)
            mine = my_stage == s
            out = jnp.where(mine, hs, out)
            # pass carry downstream (right for fwd, left for reverse)
            shift = [(i, (i + 1) % n) for i in range(n)] if not reverse else \
                    [(i, (i - 1) % n) for i in range(n)]
            h_next = jax.lax.ppermute(jnp.where(mine, last, h), "seq", shift)
            # devices that already ran keep their output; devices not yet at
            # their stage adopt the incoming carry
            h = jnp.where(my_stage == s + 1, h_next, h)
            return (h, out)

        # pvary: mark the carries as device-varying over 'seq' so the
        # fori_loop carry type matches its (varying) outputs.
        h0 = _pvary(jnp.zeros((b, h_dim), xs.dtype), ("seq",))
        out0 = _pvary(
            jnp.zeros(x_proj.shape[:2] + (h_dim,), xs.dtype), ("seq",))
        _, out = jax.lax.fori_loop(0, n, stage, (h0, out0))
        return out

    spec_t = P(None, "seq", None)
    rep = P()
    return shard_map(local, mesh=mesh,
                     in_specs=(spec_t, rep, rep, rep, rep, rep),
                     out_specs=spec_t)(x, vl_arg, wi, bi, wh, bh)


def encoder_seq_sharded(mesh: Mesh, params: dict, config,
                        x: jax.Array,
                        input_lengths: jax.Array | None = None) -> jax.Array:
    """Run the full acoustic encoder (models.encoder.Encoder) with the TIME
    axis sharded over mesh axis ``seq``, reusing the trained flax params.

    x: (B, T, F) features with T divisible by n_seq * prod(conv strides).
    ``input_lengths`` (B,) optional true frame counts: when given, the
    wavefront GRUs mask per utterance (pass-through carry, zero emission at
    pad steps), matching the unsharded length-aware encoder at every valid
    frame — this makes the sharded encoder usable on ordinary padded eval
    batches, not just full-span long audio. Returns (B, T', H) with T' the
    padded-to-shards conv output length; rows past the true conv output are
    zero (see conv_time_sharded).

    Mirrors Encoder.__call__ (models/encoder.py): VALID convs + ReLU, reshape
    to (B, T', F'*C), rnn_layers bidirectional GRU layers, final directions
    summed (reference model.py:75-77).
    """
    from speech_tpu.models.encoder import conv_out_lengths, conv_out_size

    out = x[..., None]  # (B, T, F, 1)
    true_t = x.shape[1]
    for i, (_, kh, _, stride) in enumerate(config.conv):
        p = params[f"Conv_{i}"]
        out = conv_time_sharded(mesh, out, p["kernel"], p["bias"], stride)
        out = jax.nn.relu(out)
        true_t = conv_out_size([config.conv[i]], true_t, dim=0)
    b, t, f, c = out.shape
    out = out.reshape(b, t, f * c)
    # Rows past the true conv output (true_t) are zero padding appended by the
    # sharded conv; the wavefront GRUs skip them exactly (static valid_len).
    if input_lengths is not None:
        valid_len = conv_out_lengths(config.conv, input_lengths)
    else:
        valid_len = None if true_t == t else true_t
    for i in range(config.rnn_layers):
        g = params[f"gru_{i}"]
        fwd_w = (g["fwd_wi"], g["fwd_bi"], g["fwd_wh"], g["fwd_bh"])
        bwd_w = (g["bwd_wi"], g["bwd_bi"], g["bwd_wh"], g["bwd_bh"])
        if config.bidirectional:
            out = bigru_seq_sharded(mesh, out, fwd_w, bwd_w,
                                    valid_len=valid_len)
        else:
            out = gru_seq_sharded(mesh, out, *fwd_w, valid_len=valid_len)
    if config.bidirectional:
        half = out.shape[-1] // 2
        out = out[..., :half] + out[..., half:]
    return out


def bigru_seq_sharded(mesh: Mesh, x: jax.Array, fwd_w: Sequence[jax.Array],
                      bwd_w: Sequence[jax.Array],
                      valid_len: int | None = None) -> jax.Array:
    """Bidirectional layer as ONE combined wavefront: both directions ride
    the same n stages (forward rolls left->right while backward rolls
    right->left), so the layer costs n*L sequential steps, not 2*n*L. Per
    stage every device scans a direction-stacked (2B, L) chunk — the
    backward direction's chunk is pre-reversed locally so a single forward
    ``lax.scan`` serves both — and each direction's carry ``ppermute``s to
    its own next device (fwd: i->i+1, bwd: i->i-1).

    fwd_w / bwd_w: (wi, bi, wh, bh). Returns (B, T, 2H) concat [fwd, bwd],
    time-sharded like the input.
    """
    n = mesh.shape["seq"]
    h_dim = fwd_w[2].shape[0]
    local_t = x.shape[1] // n
    wi = jnp.stack([fwd_w[0], bwd_w[0]])  # (2, D, 3H)
    bi = jnp.stack([fwd_w[1], bwd_w[1]])
    wh = jnp.stack([fwd_w[2], bwd_w[2]])
    bh = jnp.stack([fwd_w[3], bwd_w[3]])
    per_utt = valid_len is not None and not isinstance(valid_len, int)
    vl_arg = (jnp.asarray(valid_len, jnp.int32) if per_utt
              else jnp.zeros((x.shape[0],), jnp.int32))  # placeholder

    def local(xs, vl, wi, bi, wh, bh):
        idx = jax.lax.axis_index("seq")
        b = xs.shape[0]
        # (2, B, L, 3H): input projections per direction (one MXU matmul).
        xp = jnp.einsum("bld,kdj->kblj", xs, wi) + bi[:, None, None, :]
        xp = jnp.stack([xp[0], xp[1][:, ::-1]])  # bwd chunk pre-reversed
        if valid_len is None:
            valid = _pvary(jnp.ones((local_t,), bool), ("seq",))
            vmask = jnp.stack([valid, valid[::-1]])[:, None, :, None]
        elif per_utt:
            # per-utterance lengths (B,) -> (2, B, L, 1); bwd mask reversed
            # along L to match its pre-reversed chunk
            pos = idx * local_t + jnp.arange(local_t)
            valid = pos[None, :] < vl[:, None]  # (B, L)
            vmask = jnp.stack([valid, valid[:, ::-1]])[:, :, :, None]
        else:
            pos = idx * local_t + jnp.arange(local_t)
            valid = pos < valid_len
            vmask = jnp.stack([valid, valid[::-1]])[:, None, :, None]

        def step(h, xs_t):  # h (2, B, H); xs_t: xp (2, B, 3H), v (2, 1, 1)
            xp_t, v = xs_t
            hp = jnp.einsum("kbh,khj->kbj", h, wh) + bh[:, None, :]
            xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            cand = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * cand + z * h
            h_new = jnp.where(v, h_new, h)
            return h_new, jnp.where(v, h_new, 0)

        xs_scan = (jnp.moveaxis(xp, 2, 0), jnp.moveaxis(vmask, 2, 0))

        def stage(s, carry):
            h, out = carry  # h (2, B, H); out (2, B, L, H)
            last, hs = jax.lax.scan(step, h, xs_scan, unroll=4)
            hs = jnp.moveaxis(hs, 0, 2)  # (2, B, L, H)
            mine_f = idx == s
            mine_b = idx == (n - 1 - s)
            mine = jnp.stack([mine_f, mine_b])[:, None, None, None]
            out = jnp.where(mine, hs, out)
            h_f = jax.lax.ppermute(jnp.where(mine_f, last[0], h[0]), "seq",
                                   [(i, (i + 1) % n) for i in range(n)])
            h_b = jax.lax.ppermute(jnp.where(mine_b, last[1], h[1]), "seq",
                                   [(i, (i - 1) % n) for i in range(n)])
            h = jnp.stack([jnp.where(idx == s + 1, h_f, h[0]),
                           jnp.where(idx == n - 2 - s, h_b, h[1])])
            return (h, out)

        h0 = _pvary(jnp.zeros((2, b, h_dim), xs.dtype), ("seq",))
        out0 = _pvary(
            jnp.zeros((2, b, local_t, h_dim), xs.dtype), ("seq",))
        _, out = jax.lax.fori_loop(0, n, stage, (h0, out0))
        # un-reverse the backward direction's chunk-local order
        return jnp.concatenate([out[0], out[1][:, ::-1]], axis=-1)

    spec_t = P(None, "seq", None)
    rep = P()
    return shard_map(local, mesh=mesh,
                     in_specs=(spec_t, rep, rep, rep, rep, rep),
                     out_specs=spec_t)(x, vl_arg, wi, bi, wh, bh)


# ---------------------------------------------------------------------------
# Config-drivable inference over a seq mesh (eval.py --n-seq / parallel.n_seq)
# ---------------------------------------------------------------------------


def seq_padded_time(t: int, n_seq: int, conv: Sequence[Sequence[int]]) -> int:
    """Smallest T' >= t satisfying the sharded encoder's constraints: each
    conv layer's (per-layer) input time divisible by n_seq * stride and halo
    frames < the local chunk."""
    stride_prod = 1
    for _, kh, _, s in conv:
        stride_prod *= s
    mult = n_seq * stride_prod
    tp = ((t + mult - 1) // mult) * mult
    while True:
        ok, cur = True, tp
        for _, kh, _, s in conv:
            if cur % (n_seq * s) or (kh - s) >= cur // n_seq:
                ok = False
                break
            cur = cur // s  # global rows after this layer (ceil-tiled)
        if ok:
            return tp
        tp += mult


def make_seq_train_step(model, tx, mesh: Mesh):
    """Jitted sequence-parallel TRAINING step for a CTC model: the encoder
    runs time-sharded over the ``seq`` mesh axis (activations are the memory
    bottleneck for long audio — each device holds T/n of every conv/GRU
    activation, in forward AND backward), the head + CTC loss run on the
    gathered (B, T', H) encoder output (tiny next to the input), and
    gradients flow back through the halo-exchange convs and wavefront GRUs
    (``shard_map``/``ppermute`` are reverse-differentiable; the replicated
    weights' gradients are psum'd across shards by shard_map's transpose).

    Returns ``step(params, opt_state, batch) -> (params, opt_state, loss)``.
    Matches the unsharded train step's gradients exactly at every valid
    frame (tests/seqparallel_test.py::test_make_seq_train_step_matches).
    Note: the SP path applies no encoder dropout (the wavefront kernels are
    deterministic); for the long-audio regime it targets, batch sizes are
    small and dropout is usually off.
    """
    import optax

    from speech_tpu.models.ctc_model import CTCModel
    from speech_tpu.models.encoder import conv_out_lengths
    from speech_tpu.ops.ctc import ctc_loss_mean

    if not isinstance(model, CTCModel):
        raise NotImplementedError(
            "sequence-parallel training is implemented for the CTC family "
            "(the flagship long-audio model); seq2seq/transducer training "
            "is label-synchronous and uses the unsharded or DP/TP paths")
    cfg = model.encoder
    n_seq = mesh.shape["seq"]

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(params):
            x = batch["inputs"]
            lens = batch["input_lengths"]
            t_pad = seq_padded_time(x.shape[1], n_seq, cfg.conv)
            if t_pad != x.shape[1]:
                x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
            eh = encoder_seq_sharded(mesh, params["enc"], cfg, x,
                                     input_lengths=lens)
            fc = params["fc"]
            logits = (eh.astype(jnp.float32)
                      @ fc["kernel"].astype(jnp.float32)
                      + fc["bias"].astype(jnp.float32))
            out_lens = conv_out_lengths(cfg.conv, lens)
            return ctc_loss_mean(logits, out_lens, batch["labels"],
                                 batch["label_lengths"], blank=model.blank)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_seq_infer_step(model, mesh: Mesh, max_len: int = 200):
    """Jitted sequence-parallel inference: the ENCODER runs with its time
    axis sharded over the ``seq`` mesh axis (the memory-bound part — conv
    halo exchange + wavefront BiGRU), and each family's decoder consumes the
    encoder output unsharded (label-axis decoders are sequential and tiny
    next to the encoder). SURVEY §5.7; reachable from ``eval.py --n-seq N``
    / config ``parallel.n_seq`` for ALL THREE families:

      * CTC: returns ``(log_probs (B, T'', V+1), lengths)`` matching
        ``CTCModel.log_probs`` at every valid frame.
      * Seq2Seq: returns greedy tokens ``(B, max_len+1)`` exactly matching
        ``Seq2SeqModel.greedy`` (the attention mask excludes the sharding
        pad rows, which are zero and beyond every utterance's length).
      * Transducer: returns greedy tokens ``(B, max_len)`` matching
        ``TransducerModel.greedy`` (pad frames are skipped by the
        per-frame length mask).

    Inputs are zero-padded on the time axis to the sharding-compatible
    length (padding is masked per utterance inside the wavefront). Outputs
    feed ``trainer.postprocess_decoded`` like the unsharded infer step.
    """
    from speech_tpu.models.ctc_model import CTCModel
    from speech_tpu.models.encoder import conv_out_lengths
    from speech_tpu.models.seq2seq import Seq2SeqModel
    from speech_tpu.models.transducer import TransducerModel

    cfg = model.encoder
    n_seq = mesh.shape["seq"]

    def sharded_encode(params, batch):
        x = batch["inputs"]
        lens = batch["input_lengths"]
        t_pad = seq_padded_time(x.shape[1], n_seq, cfg.conv)
        if t_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        eh = encoder_seq_sharded(mesh, params["enc"], cfg, x,
                                 input_lengths=lens)
        return eh, conv_out_lengths(cfg.conv, lens)

    if isinstance(model, Seq2SeqModel):
        @jax.jit
        def step(params, batch):
            eh, out_lens = sharded_encode(params, batch)
            eh = eh.astype(model.dtype)
            mask = jnp.arange(eh.shape[1])[None, :] < out_lens[:, None]
            return model.apply({"params": params}, eh, mask, max_len,
                               method="_greedy_from")
    elif isinstance(model, TransducerModel):
        @jax.jit
        def step(params, batch):
            eh, out_lens = sharded_encode(params, batch)
            return model.apply({"params": params}, eh.astype(model.dtype),
                               out_lens, max_out=max_len,
                               method="_greedy_from")
    elif isinstance(model, CTCModel):
        @jax.jit
        def step(params, batch):
            eh, out_lens = sharded_encode(params, batch)
            fc = params["fc"]
            logits = eh.astype(jnp.float32) @ fc["kernel"].astype(jnp.float32) \
                + fc["bias"].astype(jnp.float32)
            return jax.nn.log_softmax(logits, axis=-1), out_lens
    else:
        raise NotImplementedError(
            f"sequence-parallel inference: unknown model family "
            f"{type(model).__name__}")

    return step
