"""RNN transducer model (encoder + prediction network + joint).

Parity target: reference speech/models/transducer_model.py:14-116. Implemented
in a later milestone of this round; see SURVEY.md §7 step 7.
"""

from __future__ import annotations


class TransducerModel:
    @classmethod
    def from_config(cls, input_dim, vocab_size, model_cfg, dtype=None):
        raise NotImplementedError("Transducer lands in a later milestone this round")
