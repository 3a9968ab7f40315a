"""Batched frame-synchronous beam search for the RNN transducer.

The reference offloads transducer decoding to its external C library's
``decode_static`` on a per-utterance numpy lattice whose prediction states are
unrolled against the ground-truth label prefix (reference: speech/models/
transducer_model.py:92-101, SURVEY §2.3 N3) — usable only when the truth is
known. This module implements the real thing: lattice-free beam search where
each hypothesis carries its own prediction-network state, batched over
utterances and beams, JIT-compiled with fixed shapes.

Algorithm (frame-synchronous with a per-frame expansion cap):
  for each encoder frame:
    rounds r = 0..max_expand:
      - every active hypothesis proposes blank, settling it for this frame;
        settled candidates merge into a top-K settled pool (with their
        prediction states)
      - for r < max_expand the active set also proposes symbol emissions;
        the top-K of those become the next round's active set with advanced
        prediction states
    the frame's output beam = the settled pool.
A hypothesis that has emitted ``max_expand`` symbols in a frame must take
blank (the final round only settles). Hypotheses with identical label
sequences are not merged (standard approximation; scores are exact
single-path log-probabilities).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30

from speech_tpu.decode._runners import RunnerCache

# Hoisted jitted programs, one per (model, beam_size, max_expand, max_out);
# see decode/_runners.py for the caching discipline.
_RUNNERS = RunnerCache()


def _get_runner(model, beam_size: int, max_expand: int, max_out: int):
    return _RUNNERS.get(
        model, (beam_size, max_expand, max_out),
        lambda: _build_runner(model, beam_size, max_expand, max_out))


class _BeamSet:
    """Fixed-width hypothesis set, beam axis = axis 1 of (B, K, ...) arrays;
    prediction states are flattened (layers, B*K, H) / (B*K, H)."""

    def __init__(self, hs, g, tokens, counts, scores):
        self.hs, self.g = hs, g
        self.tokens, self.counts, self.scores = tokens, counts, scores

    def leaves(self):
        return (self.hs, self.g, self.tokens, self.counts, self.scores)


def _build_runner(model, beam_size: int, max_expand: int, max_out: int):
    """Build the jitted encode + beam-search program for one config.

    The returned ``run(params, inputs, input_lengths)`` is a single jitted
    function; batch/time shapes are resolved at trace time, so jax.jit's
    cache gives one compiled program per bucket shape."""
    k = beam_size
    v1 = model.vocab_size + 1
    blank = model.blank
    sym_ids = jnp.arange(v1)
    not_blank = sym_ids != blank

    @jax.jit
    def run(params, inputs, input_lengths):
        x, out_lengths = model.apply({"params": params}, inputs,
                                     input_lengths, method="encode")
        b, t_max, _ = x.shape

        hs0, g0 = model.apply({"params": params}, b * k,
                              method="predict_init")
        tokens0 = jnp.full((b, k, max_out), blank, jnp.int32)
        counts0 = jnp.zeros((b, k), jnp.int32)
        scores0 = jnp.full((b, k), _NEG).at[:, 0].set(0.0)

        def gather_bk(arr, src):
            idx = src.reshape(src.shape + (1,) * (arr.ndim - 2))
            return jnp.take_along_axis(arr, idx, axis=1)

        def gather_state(hs, g, src):
            flat = (jnp.arange(b)[:, None] * k + src).reshape(-1)
            return hs[:, flat], g[flat]

        def merge_pools(a: "_BeamSet", b_set: "_BeamSet") -> "_BeamSet":
            """Top-K merge of two beam sets by score."""
            pool = jnp.concatenate([a.scores, b_set.scores], axis=1)  # (B, 2K)
            scores, sel = jax.lax.top_k(pool, k)
            from_b = sel >= k
            src = jnp.where(from_b, sel - k, sel)
            tokens = jnp.where(from_b[..., None], gather_bk(b_set.tokens, src),
                               gather_bk(a.tokens, src))
            counts = jnp.where(from_b, gather_bk(b_set.counts, src),
                               gather_bk(a.counts, src))
            a_hs, a_g = gather_state(a.hs, a.g, src)
            b_hs, b_g = gather_state(b_set.hs, b_set.g, src)
            fb_flat = from_b.reshape(-1)
            hs = jnp.where(fb_flat[None, :, None], b_hs, a_hs)
            g = jnp.where(fb_flat[:, None], b_g, a_g)
            return _BeamSet(hs, g, tokens, counts, scores)

        def frame(carry, xs):
            hs, g, tokens, counts, scores = carry
            x_t, t_idx = xs
            active_frame = t_idx < out_lengths
            x_tk = jnp.repeat(x_t, k, axis=0)

            settled = _BeamSet(hs, g, tokens, counts,
                               jnp.full((b, k), _NEG))
            active = _BeamSet(hs, g, tokens, counts, scores)

            for r in range(max_expand + 1):
                logp = model.apply({"params": params}, x_tk, active.g,
                                   method="joint_step").reshape(b, k, v1)

                # settle via blank
                blank_set = _BeamSet(active.hs, active.g, active.tokens,
                                     active.counts,
                                     active.scores + logp[..., blank])
                settled = merge_pools(settled, blank_set)

                # expand via symbols
                if r < max_expand:
                    ext = active.scores[..., None] + logp
                    ext = jnp.where(not_blank[None, None, :], ext, _NEG)
                    ext = jnp.where((active.counts < max_out)[..., None], ext,
                                    _NEG)
                    new_scores, idx = jax.lax.top_k(ext.reshape(b, k * v1), k)
                    src = idx // v1
                    sym = (idx % v1).astype(jnp.int32)
                    na_hs, na_g = gather_state(active.hs, active.g, src)
                    nhs, ng = model.apply({"params": params}, na_hs,
                                          sym.reshape(-1),
                                          method="predict_step")
                    na_tokens = gather_bk(active.tokens, src)
                    na_counts = gather_bk(active.counts, src)
                    slot = (jnp.arange(max_out)[None, None, :]
                            == na_counts[..., None])
                    na_tokens = jnp.where(slot, sym[..., None], na_tokens)
                    active = _BeamSet(nhs, ng, na_tokens, na_counts + 1,
                                      new_scores)

            keep = active_frame[:, None]
            keep_flat = jnp.repeat(active_frame, k)
            hs = jnp.where(keep_flat[None, :, None], settled.hs, hs)
            g = jnp.where(keep_flat[:, None], settled.g, g)
            tokens = jnp.where(keep[..., None], settled.tokens, tokens)
            counts = jnp.where(keep, settled.counts, counts)
            scores = jnp.where(keep, settled.scores, scores)
            return (hs, g, tokens, counts, scores), None

        xs = (jnp.swapaxes(x, 0, 1), jnp.arange(t_max))
        carry = (hs0, g0, tokens0, counts0, scores0)
        (hs, g, tokens, counts, scores), _ = jax.lax.scan(frame, carry, xs)
        best = jnp.argmax(scores, axis=1)
        best_tokens = jnp.take_along_axis(tokens, best[:, None, None],
                                          axis=1)[:, 0]
        best_counts = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]
        best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        return best_tokens, best_counts, best_scores

    return run


def rnnt_beam_search(model, params, batch: dict, beam_size: int = 4,
                     max_expand: int = 2, max_out: int = 200
                     ) -> tuple[list[list[int]], np.ndarray]:
    """Returns (per-utterance label lists, (B,) best path log-probs)."""
    run = _get_runner(model, beam_size, max_expand, max_out)
    bt, bc, bs = run(params, batch["inputs"], batch["input_lengths"])
    bt, bc = np.asarray(bt), np.asarray(bc)
    return [bt[i, : bc[i]].tolist() for i in range(bt.shape[0])], np.asarray(bs)
