"""Device mesh + sharded training step.

Data-parallel SPMD: the global batch is sharded over the mesh ``data`` axis,
parameters and optimizer state are replicated, and the batch-mean loss makes
XLA insert the gradient ``psum`` over ICI automatically (GSPMD). The step
function is the SAME pure function used single-device (speech_tpu.training.
trainer.make_train_step builds it unsharded); here it is jitted with explicit
in/out shardings.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
each host feeds its local shard of the batch (loader batch order is seeded and
identical across hosts, SURVEY §7 hard part 6).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with leading-axis (data) sharding.

    Single-process: a plain device_put. Multi-host: ``batch`` holds THIS
    host's rows only (see data.loader Loader process_shard) and the global
    array is assembled with ``jax.make_array_from_process_local_data`` —
    each host's shard lands on its local devices, no cross-host copy.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()}


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch (leading) axis up to a multiple of the data-axis size.

    Padded rows get zero inputs and zero lengths; zero-length utterances
    contribute a constant to the loss denominator only, and eval code drops
    them by length. Needed when len(dataset) % (B * n_data) != 0.
    """
    b = next(iter(batch.values())).shape[0]
    target = ((b + multiple - 1) // multiple) * multiple
    if target == b:
        return batch
    out = {}
    for k, v in batch.items():
        pad = [(0, target - b)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(np.asarray(v), pad)
    return out


def make_parallel_train_step(model, tx, mesh: Mesh, params=None,
                             frontend=None):
    """Mesh-parallel version of training.trainer.make_train_step.

    Data parallel: batch sharded on the ``data`` axis, gradient all-reduce
    inserted by XLA. If the mesh has a ``model`` axis of size > 1, pass the
    (already TP-sharded, see parallel.tp.shard_params) ``params`` so the jit
    preserves the tensor-parallel weight shardings; GSPMD then inserts the
    TP collectives inside the encoder scans as well. Donates params/opt_state
    buffers.
    """
    import optax

    def loss_fn(params, batch, rng):
        # Same rng split as the single-device step (training.trainer.
        # make_train_step): Seq2Seq scheduled sampling draws from "sample".
        k_drop, k_sample = jax.random.split(rng)
        return model.apply({"params": params}, batch, True, method="loss",
                           rngs={"dropout": k_drop, "sample": k_sample})

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step_fn(params, opt_state, batch, rng):
        if frontend is not None:
            batch = frontend(batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grad_norm

    in_key = "waveforms" if frontend is not None else "inputs"
    batch_shardings = {
        in_key: bsh, "input_lengths": bsh, "labels": bsh,
        "label_lengths": bsh,
    }
    if params is not None and mesh.shape.get("model", 1) > 1:
        from speech_tpu.parallel.tp import param_shardings

        psh = param_shardings(params, mesh)
        # opt_state initialized from sharded params mirrors their shardings;
        # let jit infer them from the arguments (in_shardings=None entries).
        return jax.jit(
            step_fn,
            in_shardings=(psh, None, batch_shardings, rep),
            out_shardings=(psh, None, rep, rep),
            donate_argnums=(0, 1),
        )
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, batch_shardings, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1),
    )
