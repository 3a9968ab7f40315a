"""Attention seq2seq model (encoder + GRU attention decoder).

Parity target: reference speech/models/seq2seq.py:14-360. Implemented in a
later milestone of this round; see SURVEY.md §7 step 6.
"""

from __future__ import annotations


class Seq2SeqModel:
    @classmethod
    def from_config(cls, input_dim, vocab_size, model_cfg, dtype=None):
        raise NotImplementedError("Seq2Seq lands in a later milestone this round")
