"""speech-tpu: a TPU-native end-to-end speech recognition framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of the ``awni/speech``
reference (CTC, attention seq2seq, RNN transducer over TIMIT/WSJ/LibriSpeech),
redesigned TPU-first: static-shape bucketed data pipelines, ``lax.scan``
recurrences, Pallas forward-backward loss kernels with custom VJPs, batched
on-device beam search, and mesh-based data/model parallelism via ``jax.sharding``.

The package root re-exports the checkpoint and scoring entry points, mirroring
the reference's public surface (reference: speech/__init__.py:1-2).
"""

__version__ = "0.1.0"

from speech_tpu.utils.io import save, load
from speech_tpu.utils.score import compute_cer

__all__ = ["save", "load", "compute_cer", "__version__"]
