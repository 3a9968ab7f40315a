"""ctypes bindings for the native featurizer (featurizer.cc).

The native library is a plain C-ABI shared object built by
``speech_tpu/native/setup.py`` (``make native``). It replaces the reference's
fork-based DataLoader workers (reference speech/loader.py:139-150) with an
in-process C++ thread pool: wav decode + framing + Bluestein rFFT + PSD
scaling + log + mean/std normalization, all outside the GIL.

Every entry point has a pure-numpy fallback (speech_tpu.data.features), so the
framework works without the compiled library; ``available()`` reports whether
the fast path is loadable.
"""

from __future__ import annotations

import ctypes
import glob
import os
from typing import Optional, Sequence

import numpy as np

_ERRORS = {
    -1: "cannot open file",
    -2: "malformed RIFF/WAVE header",
    -3: "unsupported sample width",
    -4: "audio shorter than one STFT window",
    -5: "feature-dim mismatch (sample rate differs from fitted stats?)",
    -6: "frame count exceeds padded buffer",
}

_lib = None
_lib_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = glob.glob(os.path.join(here, "_featurizer*.so"))
    if not candidates:
        return None
    try:
        lib = ctypes.CDLL(candidates[0])
    except OSError:
        return None
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    f32_p = ctypes.POINTER(ctypes.c_float)
    i32_p = ctypes.POINTER(ctypes.c_int32)

    lib.stpu_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.stpu_wav_info.restype = ctypes.c_int
    lib.stpu_wav_read.argtypes = [ctypes.c_char_p, f32_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int)]
    lib.stpu_wav_read.restype = ctypes.c_int64
    lib.stpu_num_frames.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.stpu_num_frames.restype = ctypes.c_int64
    lib.stpu_log_specgram_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, f32_p, f32_p,
        ctypes.c_int64, f32_p, ctypes.c_int64]
    lib.stpu_log_specgram_file.restype = ctypes.c_int64
    lib.stpu_featurize_batch.argtypes = [
        c_char_pp, ctypes.c_int64, ctypes.c_int, ctypes.c_int, f32_p, f32_p,
        ctypes.c_int64, f32_p, ctypes.c_int64, i32_p, ctypes.c_int]
    lib.stpu_featurize_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    """True when the compiled featurizer library is loadable."""
    return _load() is not None


def _f32_ptr(arr: Optional[np.ndarray]):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_info(path: str) -> tuple[int, int]:
    """(sample_rate, n_samples) from the wav header, natively."""
    lib = _load()
    assert lib is not None
    sr = ctypes.c_int(0)
    n = ctypes.c_int64(0)
    rc = lib.stpu_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(n))
    if rc != 0:
        raise IOError(f"{path}: {_ERRORS.get(rc, rc)}")
    return sr.value, n.value


def num_frames_file(path: str, window_ms: int = 20, step_ms: int = 10) -> int:
    """STFT frame count for a wav, from the header only."""
    lib = _load()
    assert lib is not None
    t = lib.stpu_num_frames(path.encode(), window_ms, step_ms)
    if t < 0:
        raise IOError(f"{path}: {_ERRORS.get(int(t), t)}")
    return int(t)


def log_specgram_file(path: str, window_ms: int = 20, step_ms: int = 10,
                      mean: Optional[np.ndarray] = None,
                      std: Optional[np.ndarray] = None) -> np.ndarray:
    """Featurize (and optionally normalize) one wav natively.

    Returns (T, F) float32, numerically matching
    speech_tpu.data.features.log_specgram_np.
    """
    lib = _load()
    assert lib is not None
    sr, _ = wav_info(path)
    nbins = int(window_ms * sr / 1e3) // 2 + 1
    t = num_frames_file(path, window_ms, step_ms)
    out = np.zeros((t, nbins), dtype=np.float32)
    if mean is not None:
        mean = np.ascontiguousarray(mean, dtype=np.float32)
        std = np.ascontiguousarray(std, dtype=np.float32)
    rc = lib.stpu_log_specgram_file(
        path.encode(), window_ms, step_ms, _f32_ptr(mean), _f32_ptr(std),
        nbins, _f32_ptr(out), t)
    if rc < 0:
        raise IOError(f"{path}: {_ERRORS.get(int(rc), rc)}")
    return out


def featurize_batch(paths: Sequence[str], t_pad: int, nbins: int,
                    window_ms: int = 20, step_ms: int = 10,
                    mean: Optional[np.ndarray] = None,
                    std: Optional[np.ndarray] = None,
                    n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Featurize a batch of wavs with the native thread pool.

    Returns (inputs (B, t_pad, nbins) float32 zero-padded, t_lens (B,) int32).
    """
    lib = _load()
    assert lib is not None
    b = len(paths)
    out = np.zeros((b, t_pad, nbins), dtype=np.float32)
    t_lens = np.zeros((b,), dtype=np.int32)
    c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    if mean is not None:
        mean = np.ascontiguousarray(mean, dtype=np.float32)
        std = np.ascontiguousarray(std, dtype=np.float32)
    rc = lib.stpu_featurize_batch(
        c_paths, b, window_ms, step_ms, _f32_ptr(mean), _f32_ptr(std), nbins,
        _f32_ptr(out), t_pad,
        t_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if rc != 0:
        raise IOError(f"native featurize_batch: {_ERRORS.get(rc, rc)}")
    return out, t_lens
