"""Model families and the explicit registry.

The reference dispatches model classes with ``eval("models." + cfg["class"])``
(reference train.py:88); here an explicit registry maps the same config
``class`` names ("CTC", "Seq2Seq", "Transducer") to flax modules so configs
stay interchangeable without eval().
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from speech_tpu.models.ctc_model import CTCModel
from speech_tpu.models.encoder import Encoder, EncoderConfig
from speech_tpu.models.seq2seq import Seq2SeqModel
from speech_tpu.models.transducer import TransducerModel

MODEL_REGISTRY: dict[str, Any] = {
    "CTC": CTCModel,
    "Seq2Seq": Seq2SeqModel,
    "Transducer": TransducerModel,
}


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(model_cfg: dict, preproc) -> Any:
    """Build a model module from a config ``model`` section + fitted preproc.

    Mirrors the reference constructor call ``model_class(preproc.input_dim,
    preproc.vocab_size, config["model"])`` (reference train.py:88-90).

    Extra, TPU-first config keys (both optional):
      ``dtype``: "float32" (default) | "bfloat16" — mixed-precision compute;
        parameters stay float32, activations/matmuls run in bf16 on the MXU.
      ``loss_impl``: "auto" | "pure" | "pallas" — which CTC/RNN-T loss kernel
        to use (models default to "auto": Pallas on TPU, pure jnp elsewhere).
    """
    name = model_cfg["class"]
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model class {name!r}; have {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    dtype_name = model_cfg.get("dtype", "float32")
    if dtype_name not in _DTYPES:
        raise ValueError(f"Unknown dtype {dtype_name!r}; have {sorted(_DTYPES)}")
    kwargs = {"dtype": _DTYPES[dtype_name]}
    impl = model_cfg.get("loss_impl")
    if impl is not None:
        if name == "CTC":
            kwargs["ctc_impl"] = impl
        elif name == "Transducer":
            kwargs["rnnt_impl"] = impl
    return cls.from_config(preproc.input_dim, preproc.vocab_size, model_cfg,
                           **kwargs)


__all__ = ["CTCModel", "Seq2SeqModel", "TransducerModel", "Encoder",
           "EncoderConfig", "MODEL_REGISTRY", "build_model"]
