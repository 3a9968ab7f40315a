"""Tagged model checkpoints: save/load of (params, preprocessor, config).

Capability parity with the reference's ``speech/utils/io.py`` — ``save``
(io.py:15-19) writes the model + fitted preprocessor under an optional
``best_`` tag, ``load`` (io.py:21-26) restores them — but with explicit
arrays + JSON instead of pickled modules, so checkpoints are portable and
inspectable. Full *training* state (optimizer, step) is handled by
``speech_tpu.training.checkpoint`` on top of these primitives; this module
covers the model-for-eval surface that the package root re-exports.

Layout of a tagged checkpoint inside ``model_dir``:
  ``{tag_}params.npz``   flattened parameter pytree
  ``{tag_}config.json``  full experiment config (incl. ``model`` section)
  ``preproc.json`` / ``preproc.npz``  fitted preprocessor (shared across tags)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

from speech_tpu.utils import pytree_io


def get_names(path: str, tag: Optional[str]) -> tuple[str, str]:
    """Tagged file names, mirroring the reference's ``best_`` prefix scheme
    (reference io.py:9-13)."""
    tag = (tag + "_") if tag else ""
    return (
        os.path.join(path, tag + "params.npz"),
        os.path.join(path, tag + "config.json"),
    )


@dataclasses.dataclass
class CheckpointBundle:
    """Everything needed to run inference with a saved model."""

    model: Any  # flax module, built from config by the model registry
    params: Any  # parameter pytree
    preproc: Any  # fitted speech_tpu.data.preprocessor.Preprocessor
    config: dict  # full experiment config


def save(model_dir: str, params: Any, preproc: Any, config: dict, tag: Optional[str] = None) -> None:
    """Save model params + config (+ preprocessor) under ``model_dir``.

    Mirrors reference io.py:15-19 / train.py:115-121: every epoch overwrites the
    untagged pair; a ``best``-tagged pair is written when dev CER improves.
    """
    os.makedirs(model_dir, exist_ok=True)
    params_path, config_path = get_names(model_dir, tag)
    pytree_io.save_dict_npz(params_path, params)
    tmp = config_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(config, f, indent=2)
    os.replace(tmp, config_path)
    preproc.save(model_dir)


def load(model_dir: str, tag: Optional[str] = None) -> CheckpointBundle:
    """Load a tagged checkpoint and rebuild the model from its config.

    Mirrors reference io.py:21-26 (eval.py:26 uses tag="best" by default,
    ``--last`` selects the untagged pair, eval.py:55-62).
    """
    from speech_tpu.data.preprocessor import Preprocessor  # lazy: avoid cycle
    from speech_tpu.models import build_model

    params_path, config_path = get_names(model_dir, tag)
    params = pytree_io.load_dict_npz(params_path)
    with open(config_path) as f:
        config = json.load(f)
    preproc = Preprocessor.restore(model_dir)
    model = build_model(config["model"], preproc)
    return CheckpointBundle(model=model, params=params, preproc=preproc, config=config)
