"""Full training-state checkpoints: params + optimizer + step, resumable.

The reference cannot resume training — it pickles only the module, no
optimizer state or step counter (reference io.py:15-19; SURVEY §5.3-5.4).
Here a checkpoint directory holds, on top of the model/eval surface written by
``speech_tpu.utils.io.save`` (params npz + config json + preproc):

  ``opt_state.npz``      optax state leaves (restored against a fresh init)
  ``train_state.json``   step, epoch, best dev metric, rng seed

so a killed run restarts from the last epoch boundary with identical
optimizer dynamics. All hosts in an SPMD run restore the same state (standard
JAX recovery model).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from speech_tpu.utils import io as model_io
from speech_tpu.utils import pytree_io

_STATE_JSON = "train_state.json"
_OPT_NPZ = "opt_state.npz"


def save_train_state(save_path: str, params: Any, opt_state: Any, preproc: Any,
                     config: dict, step: int, epoch: int,
                     best_so_far: float,
                     opt_layout: Optional[str] = None) -> None:
    model_io.save(save_path, params, preproc, config)
    pytree_io.save_leaves_npz(os.path.join(save_path, _OPT_NPZ), opt_state)
    state = {"step": int(step), "epoch": int(epoch),
             "best_so_far": float(best_so_far)}
    if opt_layout is not None:
        # Opt-state layout tag (e.g. "fused" vs "tree"): restoring against a
        # different layout silently misassigns leaves or fails late, so
        # restore_train_state asserts it matches.
        state["opt_layout"] = opt_layout
    tmp = os.path.join(save_path, _STATE_JSON + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(save_path, _STATE_JSON))


def has_train_state(save_path: str) -> bool:
    return (os.path.exists(os.path.join(save_path, _STATE_JSON))
            and os.path.exists(os.path.join(save_path, _OPT_NPZ)))


def restore_train_state(save_path: str, opt_state_target: Any,
                        expect_opt_layout: Optional[str] = None
                        ) -> tuple[Any, Any, dict]:
    """Returns (params, opt_state, state_dict). ``opt_state_target`` is a
    freshly initialized optax state providing the pytree structure.

    ``expect_opt_layout``: the layout tag of the CURRENT optimizer config
    ("fused"/"tree"); if the checkpoint recorded a different tag — e.g. the
    ``optimizer.fused`` flag was flipped between the saving run and this
    resume — raise instead of restoring a vector state into a tree (or vice
    versa). Checkpoints from before the tag was introduced skip the check.
    """
    with open(os.path.join(save_path, _STATE_JSON)) as f:
        state = json.load(f)
    saved_layout = state.get("opt_layout")
    if (expect_opt_layout is not None and saved_layout is not None
            and saved_layout != expect_opt_layout):
        raise ValueError(
            f"checkpoint at {save_path!r} has optimizer-state layout "
            f"{saved_layout!r} but the current config builds {expect_opt_layout!r} "
            f"(optimizer.fused flipped between runs?); restore with the "
            f"original setting or start a fresh run")
    bundle = model_io.load(save_path)
    opt_state = pytree_io.load_leaves_npz_like(
        os.path.join(save_path, _OPT_NPZ), opt_state_target)
    return bundle.params, opt_state, state
