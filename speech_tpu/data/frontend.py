"""On-device feature extraction frontend (fused into the jitted step).

The reference featurizes on the host inside DataLoader workers (reference
speech/loader.py:156-166). This frontend instead ships padded RAW WAVEFORMS
to the device and runs STFT + (optional mel) + log + normalization INSIDE the
jitted train/eval program, so featurization fuses with the first conv layer's
HBM traffic and rides the accelerator (BASELINE north star: on-device fused
featurization). Enable with ``data.on_device_features: true`` in the config;
the loader then emits ``waveforms`` (B, S_pad) float32 instead of ``inputs``.

Numerics match the host pipeline exactly (same PSD scaling, same mel
triangles, same normalization stats), including zeros at padded frames —
tests/frontend_test.py asserts parity.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from speech_tpu.data import features as F


class OnDeviceFrontend:
    """Pure-function batch transform: waveforms -> normalized features.

    Call inside a jitted step. The normalization stats and (for mel) the
    filterbank are closed-over constants, so XLA folds them into the program.
    """

    def __init__(self, preproc, sample_rate: int):
        self.sample_rate = int(sample_rate)
        self.feature_type = getattr(preproc, "feature_type", "logspec")
        self.n_mels = getattr(preproc, "n_mels", 0)
        self.mean = np.asarray(preproc.mean, np.float32)
        self.std = np.asarray(preproc.std, np.float32)

    def featurize(self, waveforms) -> Any:
        if self.feature_type == "logmel":
            feats = F.log_mel_batch(waveforms, self.sample_rate, self.n_mels)
        else:
            feats = F.log_specgram_batch(waveforms, self.sample_rate)
        return (feats - self.mean) / self.std

    def __call__(self, batch: dict) -> dict:
        if "waveforms" not in batch:
            return batch  # already featurized (host path)
        out = {k: v for k, v in batch.items() if k != "waveforms"}
        feats = self.featurize(batch["waveforms"])
        # Zero padded frames: host-path padding is zeros, while featurizing a
        # zero-padded waveform yields (log(eps)-mean)/std ~ -9 sigma there.
        # Keeps the two paths bit-compatible for any future unmasked
        # time-axis op (ADVICE r2).
        lens = batch.get("input_lengths")
        if lens is not None:
            valid = jnp.arange(feats.shape[1])[None, :] < lens[:, None]
            feats = jnp.where(valid[:, :, None], feats, 0.0)
        out["inputs"] = feats
        return out


def samples_for_frames(t_frames: int, sample_rate: int,
                       window_ms: int = F.DEFAULT_WINDOW_MS,
                       step_ms: int = F.DEFAULT_STEP_MS) -> int:
    """Waveform length (samples) that yields exactly ``t_frames`` STFT
    frames — the static S_pad for a padded frame budget."""
    nperseg, hop = F.stft_params(sample_rate, window_ms, step_ms)
    return nperseg + hop * (t_frames - 1)
