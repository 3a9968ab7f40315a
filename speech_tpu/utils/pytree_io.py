"""Pytree <-> npz serialization helpers.

The reference pickles whole ``nn.Module`` objects (reference: speech/utils/
io.py:15-26), which ties checkpoints to the source tree. Here checkpoints are
explicit arrays: nested dicts of arrays flatten to '/'-joined keys in a single
``.npz`` so they can be restored with no target structure; arbitrary pytrees
(e.g. optax states) are stored as indexed leaves and restored against a target
treedef from a fresh init.
"""

from __future__ import annotations

import io
import os
from typing import Any, Mapping

import jax
import numpy as np

_SEP = "/"


def flatten_dict(tree: Mapping[str, Any], prefix: str = "") -> dict[str, Any]:
    """Flatten a nested string-keyed dict to '/'-joined keys."""
    out: dict[str, Any] = {}
    for k, v in tree.items():
        if _SEP in k:
            raise ValueError(f"Key {k!r} contains separator {_SEP!r}")
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(flatten_dict(v, prefix=key + _SEP))
        else:
            out[key] = v
    return out


def unflatten_dict(flat: Mapping[str, Any]) -> dict[str, Any]:
    """Inverse of :func:`flatten_dict`."""
    out: dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_dict_npz(path: str, tree: Mapping[str, Any]) -> None:
    """Save a nested dict-of-arrays pytree to a single npz file (atomic)."""
    flat = flatten_dict(tree)
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    _atomic_savez(path, arrays)


def load_dict_npz(path: str) -> dict[str, Any]:
    """Load a nested dict-of-arrays pytree saved by :func:`save_dict_npz`."""
    with np.load(path, allow_pickle=False) as data:
        return unflatten_dict({k: data[k] for k in data.files})


def save_leaves_npz(path: str, tree: Any) -> None:
    """Save an arbitrary pytree's leaves (structure NOT saved)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    _atomic_savez(path, arrays)


def load_leaves_npz_like(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_leaves_npz` using ``target``'s structure."""
    with np.load(path, allow_pickle=False) as data:
        leaves = [data[f"leaf_{i:05d}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(target)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves but target expects {treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _atomic_savez(path: str, arrays: Mapping[str, np.ndarray]) -> None:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
