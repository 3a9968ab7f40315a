"""Audio I/O built on the Python stdlib (no soundfile dependency).

Capability parity with the reference's ``speech/utils/wave.py``:
``array_from_wave`` (reference wave.py:8-10) reads an audio file as int16
samples plus the sample rate; ``wav_duration`` (reference wave.py:12-16)
probes the duration in seconds without reading the payload.

The reference uses ``soundfile`` (libsndfile); here we parse the containers
directly: RIFF/WAVE via the stdlib ``wave`` module, NIST SPHERE (TIMIT's
native container) via its ASCII header — including WSJ's
embedded-shorten-v2 payloads (utils/shorten.py) — and FLAC (LibriSpeech's
container) via the native C++ decoder in speech_tpu/native/flacdec.cc
(pure-Python fallback in utils/flac.py). Every supported corpus reads in
place with no prior conversion, and the training hot path stays native:
the GIL-free C++ featurizer decodes SPHERE/shorten in-pipeline too
(speech_tpu/native/sphere_core.h, parity-tested against this module).
"""

from __future__ import annotations

import wave as _wave

import numpy as np


def _read_sphere(file_name: str, header_only: bool = False
                 ) -> tuple[np.ndarray | None, int]:
    """Read a NIST SPHERE file (uncompressed PCM or mu-law payloads).

    TIMIT's ``.wav`` files are SPHERE containers (reference converts them
    with sox, examples/timit/preprocess.py:65-68; soundfile reads them
    directly — this matches soundfile). The header is ASCII ``name -type
    value`` lines inside a fixed-size block whose size is on line 2.
    """
    with open(file_name, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"{file_name}: not a NIST SPHERE file")
        header_size = int(f.readline().strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", errors="replace")
        fields: dict[str, str] = {}
        for line in header.splitlines()[2:]:
            if line.strip() == "end_head":
                break
            parts = line.split(None, 2)
            if len(parts) == 3:
                name, _type, value = parts
                fields[name] = value
        rate = int(fields.get("sample_rate", 16000))
        if header_only:
            return None, rate
        n = int(fields["sample_count"])
        channels = int(fields.get("channel_count", 1))
        nbytes = int(fields.get("sample_n_bytes", 2))
        coding = fields.get("sample_coding", "pcm")
        byte_fmt = fields.get("sample_byte_format", "01")
        f.seek(header_size)
        raw = f.read()
    if "wavpack" in coding:
        raise ValueError(
            f"{file_name}: SPHERE payload is '{coding}'-compressed; convert "
            "once with sph2pipe (nothing in the supported corpora uses "
            "wavpack)")
    if "shorten" in coding:
        # WSJ's embedded-shorten-v2 payloads decode natively
        # (utils/shorten.py) — no sph2pipe needed to read the corpus in
        # place. The SPHERE header's sample_count is authoritative; the
        # shorten stream may carry trailing padding blocks.
        from speech_tpu.utils.shorten import decode_shorten

        if n > 1 << 27:
            # ~2.3 h at 16 kHz — far beyond any utterance; a hostile header
            # count would otherwise size the decode buffers
            raise ValueError(f"{file_name}: implausible SPHERE sample_count "
                             f"{n}")
        # headroom for the final padded block; bounds hostile streams that
        # would otherwise expand far past the header's sample_count
        audio, _info = decode_shorten(raw, max_samples=n + (1 << 20))
        if _info["nchan"] != channels:
            raise ValueError(
                f"{file_name}: shorten stream has {_info['nchan']} channels "
                f"but the SPHERE header says {channels}")
        if audio.ndim == 1 and channels > 1:
            audio = audio.reshape(-1, channels)
        if audio.shape[0] < n:
            raise ValueError(
                f"{file_name}: shorten payload decodes to {audio.shape[0]} "
                f"samples but the SPHERE header promises {n}")
        audio = audio[:n]  # ULAW-typed streams are already linear int16
        return np.asarray(audio, dtype=np.int16), rate
    if coding.startswith("ulaw") or coding.startswith("mu-law"):
        u = np.frombuffer(raw[: n * channels], dtype=np.uint8)
        audio = _ulaw_decode(u)
    elif nbytes == 2:
        dt = "<i2" if byte_fmt == "01" else ">i2"
        audio = np.frombuffer(raw[: 2 * n * channels], dtype=dt).astype("<i2")
    elif nbytes == 1:
        audio = (np.frombuffer(raw[: n * channels],
                               dtype=np.int8).astype(np.int16)) << 8
    else:
        raise ValueError(f"{file_name}: unsupported SPHERE sample_n_bytes "
                         f"{nbytes}")
    if channels > 1:
        audio = audio.reshape(-1, channels)
    return np.asarray(audio, dtype=np.int16), rate


def _ulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear int16 (exact table semantics)."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = ((mantissa << 3) + 0x84) << exponent
    sample = sample - 0x84
    return np.where(sign != 0, -sample, sample).astype(np.int16)


def _sniff(file_name: str) -> str:
    with open(file_name, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"RIFF"):
        return "wav"
    if magic.startswith(b"NIST_1A"):
        return "sphere"
    if magic.startswith(b"fLaC"):
        return "flac"
    return "unknown"


def array_from_wave(file_name: str) -> tuple[np.ndarray, int]:
    """Read an audio file (RIFF/WAVE or NIST SPHERE, dispatched by magic).

    Returns ``(audio, sample_rate)`` where ``audio`` is an int16 array of shape
    ``(num_frames,)`` for mono or ``(num_frames, num_channels)`` otherwise.
    """
    kind = _sniff(file_name)
    if kind == "sphere":
        audio, rate = _read_sphere(file_name)
        return audio, rate
    if kind == "flac":
        # Native C++ decoder when built (speech_tpu/native/flacdec.cc),
        # pure-Python fallback otherwise — so the LibriSpeech corpus is
        # readable in place, like the reference's soundfile path
        # (reference wave.py:8-10), with no conversion tools.
        from speech_tpu.native import flacdec
        if flacdec.available():
            return flacdec.read_flac(file_name)
        from speech_tpu.utils.flac import read_flac
        return read_flac(file_name)
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
    """Duration of an audio file in seconds, from the header only."""
    kind = _sniff(file_name)
    if kind == "flac":
        from speech_tpu.utils.flac import flac_info
        info = flac_info(file_name)
        if info["total_samples"] == 0:
            # Legal "unknown length" streams would yield duration 0.0 and
            # silently corrupt manifest durations/bucketing; require a real
            # header total (decode-to-count is available via array_from_wave).
            raise ValueError(
                f"{file_name}: FLAC STREAMINFO total_samples is 0 (unknown "
                "length); cannot derive duration from the header")
        return info["total_samples"] / float(info["sample_rate"])
    if kind == "sphere":
        with open(file_name, "rb") as f:
            f.readline()
            header_size = int(f.readline().strip())
            f.seek(0)
            header = f.read(header_size).decode("ascii", errors="replace")
        fields = {}
        for line in header.splitlines()[2:]:
            parts = line.split(None, 2)
            if len(parts) == 3:
                fields[parts[0]] = parts[2]
        return int(fields["sample_count"]) / float(fields["sample_rate"])
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
