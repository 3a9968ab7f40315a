"""Batched greedy (argmax) CTC decoding.

Capability parity with the reference's ``CTC.max_decode`` (reference: speech/
models/ctc_model.py:62-70 — collapse repeats, drop blanks) and with its eval
path ``infer`` at beam_size=1 (ctc_model.py:55-60). The argmax + collapse-mask
computation is vectorized on device over the whole batch; only the final
ragged extraction runs on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("blank",))
def _greedy_mask(log_probs: jax.Array, lengths: jax.Array, blank: int):
    """Returns (ids (B,T), keep (B,T) bool): argmax path with collapse mask."""
    ids = jnp.argmax(log_probs, axis=-1)  # (B, T)
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    t_idx = jnp.arange(ids.shape[1])[None, :]
    keep = (ids != blank) & (ids != prev) & (t_idx < lengths[:, None])
    return ids, keep


def ctc_greedy_decode(log_probs: jax.Array, lengths: jax.Array, blank: int
                      ) -> list[list[int]]:
    """Greedy CTC decode of a batch. log_probs: (B, T, V+1); returns per-
    utterance label id lists."""
    ids, keep = _greedy_mask(log_probs, lengths, blank)
    ids = np.asarray(ids)
    keep = np.asarray(keep)
    return [ids[b][keep[b]].tolist() for b in range(ids.shape[0])]


def max_decode(pred, blank: int) -> list[int]:
    """Collapse a single pre-argmaxed id sequence (reference ctc_model.py:62-70)."""
    seq: list[int] = []
    prev = None
    for p in pred:
        if p != blank and p != prev:
            seq.append(int(p))
        prev = p
    return seq
