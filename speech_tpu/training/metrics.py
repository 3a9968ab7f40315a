"""Metrics logging: JSONL always, TensorBoard optionally.

Capability parity with the reference's tensorboard_logger scalars (reference
train.py:43, 112-113: per-iteration train_loss, per-epoch dev_loss/dev_cer).
The primary sink is an append-only ``metrics.jsonl`` in the run directory
(machine-readable, no deps); TensorBoard event files are written too when
``tensorboard=True`` and tensorflow is importable (lazy import — TF costs
~20 s to load and is not needed on workers).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, save_path: str, tensorboard: bool = False):
        os.makedirs(save_path, exist_ok=True)
        self._path = os.path.join(save_path, "metrics.jsonl")
        self._file = open(self._path, "a", buffering=1)
        self._tb_writer = None
        if tensorboard:
            try:
                import tensorflow as tf  # lazy; optional

                self._tb_writer = tf.summary.create_file_writer(save_path)
            except ImportError:
                pass

    def log_value(self, name: str, value: float, step: int) -> None:
        rec = {"name": name, "value": float(value), "step": int(step),
               "time": time.time()}
        self._file.write(json.dumps(rec) + "\n")
        if self._tb_writer is not None:
            import tensorflow as tf

            with self._tb_writer.as_default():
                tf.summary.scalar(name, float(value), step=int(step))

    def close(self) -> None:
        self._file.close()
        if self._tb_writer is not None:
            self._tb_writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
