"""WAV audio I/O built on the Python stdlib (no soundfile dependency).

Capability parity with the reference's ``speech/utils/wave.py``:
``array_from_wave`` (reference wave.py:8-10) reads a wav file as int16 samples
plus the sample rate; ``wav_duration`` (reference wave.py:12-16) probes the
duration in seconds without reading the payload.

The reference uses ``soundfile`` (libsndfile); here we parse RIFF/WAVE directly
with the stdlib ``wave`` module, which handles the PCM wavs produced by every
recipe in this framework (TIMIT NIST->wav, WSJ sph2pipe, LibriSpeech flac->wav
all emit 16-bit PCM).
"""

from __future__ import annotations

import wave as _wave

import numpy as np


def array_from_wave(file_name: str) -> tuple[np.ndarray, int]:
    """Read a PCM wav file.

    Returns ``(audio, sample_rate)`` where ``audio`` is an int16 array of shape
    ``(num_frames,)`` for mono or ``(num_frames, num_channels)`` otherwise.
    """
    with _wave.open(file_name, "rb") as wf:
        n_channels = wf.getnchannels()
        sample_width = wf.getsampwidth()
        n_frames = wf.getnframes()
        rate = wf.getframerate()
        raw = wf.readframes(n_frames)
    if sample_width == 2:
        audio = np.frombuffer(raw, dtype="<i2")
    elif sample_width == 1:
        # 8-bit wav is unsigned; recentre to signed int16 range.
        audio = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    elif sample_width == 4:
        audio = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
    else:
        raise ValueError(f"Unsupported sample width {sample_width} in {file_name}")
    if n_channels > 1:
        audio = audio.reshape(-1, n_channels)
    return np.asarray(audio, dtype=np.int16), rate


def wav_duration(file_name: str) -> float:
    """Duration of a wav file in seconds, from the header only."""
    with _wave.open(file_name, "rb") as wf:
        return wf.getnframes() / float(wf.getframerate())


def write_wave(file_name: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write a mono or multi-channel int16 PCM wav (used by tests and recipes)."""
    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        raise ValueError("write_wave expects int16 samples")
    n_channels = 1 if audio.ndim == 1 else audio.shape[1]
    with _wave.open(file_name, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(audio.tobytes())
