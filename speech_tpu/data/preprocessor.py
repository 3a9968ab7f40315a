"""Fitted featurizer + tokenizer that travels with every checkpoint.

Capability parity with the reference's ``Preprocessor`` (reference: speech/
loader.py:15-85): per-frequency-bin mean/std estimated from a bounded sample
of training files, a symbol vocabulary built from the training transcripts
with optional ``<s>``/``</s>`` tokens (START deliberately last so model output
heads can exclude it — reference loader.py:39-43), ``encode``/``decode``
between text and int ids, and ``preprocess`` = log-spectrogram + normalize +
encode.

Differences by design:
  * Vocabulary order is deterministic (sorted) instead of Python-set order.
  * Statistics sampling uses an explicit seeded RNG.
  * Serialization is JSON + npz (see ``save``/``restore``) instead of pickle,
    so checkpoints are source-tree independent (reference io.py pickles the
    object).
"""

from __future__ import annotations

import json
import os
import random
from typing import Optional, Sequence

import numpy as np

from speech_tpu.data import features as F
from speech_tpu.data.manifest import read_data_json

_PREPROC_JSON = "preproc.json"
_PREPROC_NPZ = "preproc.npz"


class Preprocessor:
    END = "</s>"
    START = "<s>"

    def __init__(self, data_json: Optional[str] = None, max_samples: int = 100,
                 start_and_end: bool = True, seed: int = 0,
                 tokens: Optional[Sequence[str]] = None,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None,
                 feature_type: str = "logspec", n_mels: int = 0):
        """Fit from a JSONL manifest (when ``data_json`` is given) or build
        from explicit fields (restore path).

        ``feature_type``: "logspec" (reference parity, loader.py:156-166) or
        "logmel" with ``n_mels`` mel bins (framework extension — the usual
        front end at LibriSpeech scale)."""
        self.feature_type = feature_type
        self.n_mels = int(n_mels)
        if feature_type == "logmel" and self.n_mels <= 0:
            raise ValueError("logmel features need n_mels > 0")
        if data_json is not None:
            data = read_data_json(data_json)
            if not data:
                raise ValueError(f"Empty manifest: {data_json}")
            audio_files = [d["audio"] for d in data]
            rng = random.Random(seed)
            rng.shuffle(audio_files)
            self.mean, self.std = compute_mean_std(
                audio_files[:max_samples], feature_type=feature_type,
                n_mels=self.n_mels)
            # Deterministic vocabulary: sorted symbol set, then END and START
            # appended so START is the final index (reference loader.py:39-43).
            symbols = sorted(set(t for d in data for t in d["text"]))
            if start_and_end:
                symbols.extend([self.END, self.START])
            self.start_and_end = start_and_end
            self.tokens = list(symbols)
        else:
            if tokens is None or mean is None or std is None:
                raise ValueError("Provide data_json or (tokens, mean, std)")
            self.tokens = list(tokens)
            self.start_and_end = start_and_end
            self.mean = np.asarray(mean, dtype=np.float32)
            self.std = np.asarray(std, dtype=np.float32)
        self.int_to_char = dict(enumerate(self.tokens))
        self.char_to_int = {v: k for k, v in self.int_to_char.items()}

    # --- text codec (reference loader.py:48-63) ---

    def encode(self, text) -> list[int]:
        text = list(text)
        if self.start_and_end:
            text = [self.START] + text + [self.END]
        return [self.char_to_int[t] for t in text]

    def decode(self, seq: Sequence[int]) -> list[str]:
        text = [self.int_to_char[int(s)] for s in seq]
        if not self.start_and_end:
            return text
        s = 1 if (text and text[0] == self.START) else 0
        e = text.index(self.END) if self.END in text else len(text)
        return text[s:e]

    # --- featurization (reference loader.py:65-69) ---

    def normalize(self, feats: np.ndarray) -> np.ndarray:
        return ((feats - self.mean) / self.std).astype(np.float32)

    def featurize_host(self, wave_file: str) -> np.ndarray:
        """Un-normalized host-side features for one file."""
        from speech_tpu.utils import wave

        audio, sr = wave.array_from_wave(wave_file)
        if self.feature_type == "logmel":
            return F.log_mel_np(audio, sr, self.n_mels)
        return F.log_specgram_np(audio, sr)

    def preprocess(self, wave_file: str, text) -> tuple[np.ndarray, list[int]]:
        from speech_tpu.native import featurizer as native

        if self.feature_type == "logspec" and native.available():
            # Featurize + normalize in one native call (GIL-free); numerics
            # match the numpy path (tests/native_featurizer_test.py). The
            # native kernel only implements the log-spectrogram path.
            try:
                inputs = native.log_specgram_file(
                    wave_file, mean=self.mean, std=self.std)
                return inputs, self.encode(text)
            except IOError:
                pass  # non-PCM or rate-mismatched file: numpy fallback
        return self.normalize(self.featurize_host(wave_file)), self.encode(text)

    @property
    def input_dim(self) -> int:
        return int(self.mean.shape[0])

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    # --- serialization (explicit arrays + JSON; not pickle) ---

    def save(self, model_dir: str) -> None:
        os.makedirs(model_dir, exist_ok=True)
        meta = {"tokens": self.tokens, "start_and_end": self.start_and_end,
                "feature_type": self.feature_type, "n_mels": self.n_mels}
        tmp = os.path.join(model_dir, _PREPROC_JSON + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(model_dir, _PREPROC_JSON))
        np.savez(os.path.join(model_dir, _PREPROC_NPZ), mean=self.mean, std=self.std)

    @classmethod
    def restore(cls, model_dir: str) -> "Preprocessor":
        with open(os.path.join(model_dir, _PREPROC_JSON)) as f:
            meta = json.load(f)
        arrs = np.load(os.path.join(model_dir, _PREPROC_NPZ))
        return cls(tokens=meta["tokens"], start_and_end=meta["start_and_end"],
                   mean=arrs["mean"], std=arrs["std"],
                   feature_type=meta.get("feature_type", "logspec"),
                   n_mels=meta.get("n_mels", 0))


def compute_mean_std(audio_files: Sequence[str], feature_type: str = "logspec",
                     n_mels: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature-bin mean/std over the given files (reference loader.py:79-85)."""
    from speech_tpu.utils import wave

    samples = []
    for af in audio_files:
        audio, sr = wave.array_from_wave(af)
        if feature_type == "logmel":
            samples.append(F.log_mel_np(audio, sr, n_mels))
        else:
            samples.append(F.log_specgram_np(audio, sr))
    stacked = np.vstack(samples)
    return (stacked.mean(axis=0).astype(np.float32),
            stacked.std(axis=0).astype(np.float32))
