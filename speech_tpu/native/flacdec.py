"""ctypes bindings for the native FLAC decoder (flacdec.cc).

Built by ``speech_tpu/native/setup.py`` (``make native``) as a plain C-ABI
shared object. ``speech_tpu.utils.wave.array_from_wave`` prefers this path
and falls back to the pure-Python decoder (speech_tpu.utils.flac) when the
library is not built; the two are parity-tested in tests/flac_test.py.
"""

from __future__ import annotations

import ctypes
import glob
import os

import numpy as np

_ERRORS = {
    -1: "cannot open file",
    -2: "not a FLAC stream / missing STREAMINFO",
    -3: "truncated FLAC stream",
    -4: "malformed FLAC bitstream",
    -5: "decoded samples exceed the STREAMINFO total",
}

_lib = None
_lib_checked = False


def _load():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = glob.glob(os.path.join(here, "_flacdec*.so"))
    if not candidates:
        return None
    try:
        lib = ctypes.CDLL(candidates[0])
    except OSError:
        return None
    i16_p = ctypes.POINTER(ctypes.c_int16)
    int_p = ctypes.POINTER(ctypes.c_int)
    lib.stpu_flac_info.argtypes = [ctypes.c_char_p, int_p, int_p, int_p,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.stpu_flac_info.restype = ctypes.c_int
    lib.stpu_flac_read.argtypes = [ctypes.c_char_p, i16_p, ctypes.c_int64,
                                   int_p, int_p]
    lib.stpu_flac_read.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    """True when the compiled FLAC decoder is loadable."""
    return _load() is not None


def flac_info(path: str) -> dict:
    """STREAMINFO fields, natively (same dict as utils.flac.flac_info)."""
    lib = _load()
    assert lib is not None
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    bits = ctypes.c_int(0)
    total = ctypes.c_int64(0)
    rc = lib.stpu_flac_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                            ctypes.byref(bits), ctypes.byref(total))
    if rc != 0:
        raise IOError(f"{path}: {_ERRORS.get(rc, rc)}")
    return {"sample_rate": sr.value, "channels": ch.value,
            "bits": bits.value, "total_samples": total.value}


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """Decode to int16 (the array_from_wave contract): (audio, sample_rate)."""
    lib = _load()
    assert lib is not None
    info = flac_info(path)
    ch = info["channels"]
    # Headroom beyond STREAMINFO's total: a stream whose last frame is padded
    # (or whose total is unset, = 0) still decodes; we truncate after. A
    # total_samples == 0 stream (legal: "unknown") has no size bound from the
    # header, so grow the buffer and retry on capacity errors — matching the
    # pure-Python decoder's unbounded decode.
    cap_frames = (info["total_samples"] or 1 << 22) + 65536
    while True:
        out = np.zeros((cap_frames, ch), dtype=np.int16)
        sr = ctypes.c_int(0)
        nch = ctypes.c_int(0)
        n = lib.stpu_flac_read(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.size, ctypes.byref(sr), ctypes.byref(nch))
        if n == -5 and info["total_samples"] == 0 and cap_frames < 1 << 31:
            cap_frames *= 2
            continue
        break
    if n < 0:
        raise IOError(f"{path}: {_ERRORS.get(int(n), n)}")
    audio = out[:n]
    if nch.value == 1:
        audio = audio[:, 0]
    return np.ascontiguousarray(audio), sr.value
