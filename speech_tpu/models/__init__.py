"""Model families and the explicit registry.

The reference dispatches model classes with ``eval("models." + cfg["class"])``
(reference train.py:88); here an explicit registry maps the same config
``class`` names ("CTC", "Seq2Seq", "Transducer") to flax modules so configs
stay interchangeable without eval().
"""

from __future__ import annotations

from typing import Any

from speech_tpu.models.ctc_model import CTCModel
from speech_tpu.models.encoder import Encoder, EncoderConfig
from speech_tpu.models.seq2seq import Seq2SeqModel
from speech_tpu.models.transducer import TransducerModel

MODEL_REGISTRY: dict[str, Any] = {
    "CTC": CTCModel,
    "Seq2Seq": Seq2SeqModel,
    "Transducer": TransducerModel,
}


def build_model(model_cfg: dict, preproc) -> Any:
    """Build a model module from a config ``model`` section + fitted preproc.

    Mirrors the reference constructor call ``model_class(preproc.input_dim,
    preproc.vocab_size, config["model"])`` (reference train.py:88-90).
    """
    name = model_cfg["class"]
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model class {name!r}; have {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    return cls.from_config(preproc.input_dim, preproc.vocab_size, model_cfg)


__all__ = ["CTCModel", "Seq2SeqModel", "TransducerModel", "Encoder",
           "EncoderConfig", "MODEL_REGISTRY", "build_model"]
