"""Tensor parallelism: shard model weights over the mesh ``model`` axis.

The reference has no TP (SURVEY §2.2); the target design is the scaling-book
recipe — annotate parameter shardings with ``NamedSharding`` and let
XLA/GSPMD insert the collectives, rather than hand-writing them. For these
encoders TP matters when a single encoder exceeds one chip's HBM or when the
per-chip batch is too small to feed the MXU.

Sharding rules (all over the ``model`` axis):
  * GRU gate projections ``*_wi``/``*_wh`` — output (3H) dim. The gate
    order is (r, z, n), each H wide; sharding the flat 3H axis over m
    devices keeps each gate's columns contiguous per device as long as
    H % m == 0 (H/m-wide column blocks land in one gate's range iff m
    divides H and 3H/m splits evenly — XLA handles the general case too,
    it just communicates more).
  * GRU biases ``*_bi``/``*_bh`` — the matching 3H dim.
  * Conv kernels — output-channel dim; conv bias likewise.
  * Dense/fc kernels — output-feature dim; bias likewise.
  * Embeddings — replicated (gathered rows are tiny).

``shard_params`` applies the rules with ``jax.device_put``; optimizer state
initialized from sharded params (``tx.init``) inherits the shardings through
``zeros_like``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: str, ndim: int, model_axis: str) -> P:
    """PartitionSpec for one param leaf, sharding its output dim over TP."""
    leaf = path.split("/")[-1]
    if leaf == "embedding" or "att_" in leaf:
        return P()
    if leaf.endswith(("_wi", "_wh")) and ndim == 2:
        return P(None, model_axis)
    if leaf.endswith(("_bi", "_bh")) and ndim == 1:
        return P(model_axis)
    if leaf == "kernel":
        # conv (kh, kw, cin, cout) or dense (din, dout): shard the last dim
        return P(*([None] * (ndim - 1) + [model_axis]))
    if leaf == "bias" and ndim == 1:
        return P(model_axis)
    return P()


def param_shardings(params: Any, mesh: Mesh, model_axis: str = "model"
                    ) -> Any:
    """A params-shaped pytree of NamedShardings implementing the TP rules."""

    def one(path, leaf):
        keys = "/".join(getattr(k, "key", str(k)) for k in path)
        spec = _spec_for(keys, leaf.ndim, model_axis)
        # Do not shard dims that don't divide evenly — fall back to
        # replication for that leaf (correct, just not distributed).
        m = mesh.shape[model_axis]
        for dim, name in enumerate(spec):
            if name == model_axis and leaf.shape[dim] % m != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """device_put the params with TP shardings (no-op specs replicate)."""
    return jax.device_put(params, param_shardings(params, mesh, model_axis))
