"""Mesh-based parallelism: data-parallel SPMD training, distributed eval.

The reference is single-process single-device (SURVEY §2.2 — no DP/TP/PP, no
comms backend). Here parallelism is first-class: a ``jax.sharding.Mesh`` with
a ``data`` axis (and an optional ``model`` axis), batch sharded across it,
parameters replicated, and gradient ``psum`` emitted by XLA from the sharding
annotations — collectives ride ICI, no hand-written backend.
"""

from speech_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    make_parallel_train_step,
    shard_batch,
    pad_batch_to_multiple,
)
from speech_tpu.parallel.seqparallel import (
    make_seq_mesh,
    conv_time_sharded,
    gru_seq_sharded,
    bigru_seq_sharded,
    encoder_seq_sharded,
)

__all__ = ["make_mesh", "batch_sharding", "replicated",
           "make_parallel_train_step", "shard_batch", "pad_batch_to_multiple",
           "make_seq_mesh", "conv_time_sharded", "gru_seq_sharded",
           "bigru_seq_sharded", "encoder_seq_sharded"]
