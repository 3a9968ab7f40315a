"""Batched beam search for the attention seq2seq model.

Replaces the reference's batch-size-1, broken-in-py3 beam search (reference:
speech/models/seq2seq.py:180-227 — it subscripts a ``filter`` object; SURVEY
§5 quirks) with a fixed-width, fully batched, JIT-compiled beam:

  * all B utterances and K beams advance in one ``decode_step`` call over a
    flattened (B*K) batch;
  * finished hypotheses stay in the beam with frozen scores (their only
    continuation is </s> at zero cost), which subsumes the reference's
    separate ``complete`` list;
  * the final hypothesis is the best finished beam (falling back to the best
    unfinished one if nothing finished within ``max_len``, as the reference
    does at seq2seq.py:221-223).

Scores are raw log-probabilities (no length normalization), matching the
reference's ranking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30

from speech_tpu.decode._runners import RunnerCache

# Hoisted jitted programs, one per (model, beam_size, max_len); see
# decode/_runners.py for the caching discipline.
_RUNNERS = RunnerCache()


def _get_runner(model, beam_size: int, max_len: int):
    return _RUNNERS.get(model, (beam_size, max_len),
                        lambda: _build_runner(model, beam_size, max_len))


def _tile_beam(x: jax.Array, k: int) -> jax.Array:
    """(B, ...) -> (B*K, ...) by repeating each row K times."""
    return jnp.repeat(x, k, axis=0)


def _build_runner(model, beam_size: int, max_len: int):
    """Build the jitted encode + beam-search program for one config."""
    k = beam_size
    v_out = model.vocab_size - 1
    end = model.end_idx
    start = model.start_idx

    @jax.jit
    def run(params, inputs, input_lengths):
        eh, out_lens, mask = model.apply({"params": params}, inputs,
                                         input_lengths, method="encode")
        b, t, h = eh.shape

        eh_k = _tile_beam(eh, k)
        mask_k = _tile_beam(mask, k)

        state = model.apply({"params": params}, eh_k, method="init_state")
        y = jnp.full((b * k,), start, jnp.int32)
        scores = jnp.full((b, k), _NEG).at[:, 0].set(0.0)
        done = jnp.zeros((b, k), bool)
        tokens = jnp.full((b, k, max_len), end, jnp.int32)

        def gather_state(state, src):
            """Reindex each (B*K, ...) state leaf by per-batch beam sources."""
            flat_src = (jnp.arange(b)[:, None] * k + src).reshape(-1)  # (B*K,)
            hx, ax, sx, ti = state
            return (hx[flat_src], ax[flat_src], sx[flat_src], ti)

        def step(carry, t_step):
            state, y, scores, done, tokens = carry
            logits, new_state = model.apply({"params": params}, eh_k, mask_k,
                                            y, state, method="decode_step")
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            logp = logp.reshape(b, k, v_out)
            # finished beams: only </s> continuation, at zero cost
            end_only = jnp.full((v_out,), _NEG).at[end].set(0.0)
            logp = jnp.where(done[..., None], end_only[None, None, :], logp)

            cand = (scores[..., None] + logp).reshape(b, k * v_out)
            new_scores, idx = jax.lax.top_k(cand, k)
            src = idx // v_out
            sym = (idx % v_out).astype(jnp.int32)

            new_state = gather_state(new_state, src)
            new_done = jnp.take_along_axis(done, src, axis=1) | (sym == end)
            new_tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
            pos = jnp.arange(max_len)[None, None, :] == t_step
            write = ~jnp.take_along_axis(done, src, axis=1)  # don't write past </s>
            new_tokens = jnp.where(pos & write[..., None], sym[..., None],
                                   new_tokens)
            return (new_state, sym.reshape(-1), new_scores, new_done,
                    new_tokens), None

        carry = (state, y, scores, done, tokens)
        carry, _ = jax.lax.scan(step, carry, jnp.arange(max_len))
        _, _, scores, done, tokens = carry

        # prefer finished hypotheses; fall back to best unfinished if none
        penalized = jnp.where(done, scores, scores - 1e15)
        best = jnp.argmax(jnp.where(done.any(1, keepdims=True), penalized,
                                    scores), axis=1)
        best_tokens = jnp.take_along_axis(tokens, best[:, None, None],
                                          axis=1)[:, 0]
        best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        start_col = jnp.full((b, 1), start, jnp.int32)
        out = jnp.concatenate([start_col, best_tokens], axis=1)
        return out, best_scores

    return run


def seq2seq_beam_search(model, params, batch: dict, beam_size: int = 10,
                        max_len: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Returns (tokens (B, max_len+1) starting with <s>, scores (B,)).

    Positions after each hypothesis's </s> are </s>-filled.
    """
    run = _get_runner(model, beam_size, max_len)
    out, best_scores = run(params, batch["inputs"], batch["input_lengths"])
    return np.asarray(out), np.asarray(best_scores)
