"""WAV I/O tests (capability parity with reference tests/wave_test.py:6-15)."""

import numpy as np

from speech_tpu.utils import wave


def test_round_trip(tmp_path):
    sr = 16000
    n = int(sr * 1.101)
    audio = (np.sin(np.linspace(0, 440 * 2 * np.pi, n)) * 20000).astype(np.int16)
    path = str(tmp_path / "t.wav")
    wave.write_wave(path, audio, sr)
    back, rate = wave.array_from_wave(path)
    assert rate == sr
    assert back.dtype == np.int16
    np.testing.assert_array_equal(back, audio)


def test_duration(tmp_path):
    sr = 8000
    audio = np.zeros(sr * 2, dtype=np.int16)
    path = str(tmp_path / "t.wav")
    wave.write_wave(path, audio, sr)
    assert wave.wav_duration(path) == 2.0


def test_stereo(tmp_path):
    sr = 16000
    audio = np.zeros((100, 2), dtype=np.int16)
    audio[:, 0] = 5
    path = str(tmp_path / "t.wav")
    wave.write_wave(path, audio, sr)
    back, rate = wave.array_from_wave(path)
    assert back.shape == (100, 2)
    assert (back[:, 0] == 5).all()


def _write_sphere(path, audio, sr, byte_format="01", coding="pcm"):
    """Minimal NIST SPHERE writer for tests (1024-byte ASCII header)."""
    if coding == "ulaw":
        payload = audio.astype(np.uint8).tobytes()
        nbytes = 1
    else:
        payload = audio.astype(">i2" if byte_format == "10" else "<i2").tobytes()
        nbytes = 2
    head = (
        "NIST_1A\n   1024\n"
        f"sample_count -i {len(audio)}\n"
        f"sample_rate -i {sr}\n"
        "channel_count -i 1\n"
        f"sample_n_bytes -i {nbytes}\n"
        f"sample_byte_format -s{len(byte_format)} {byte_format}\n"
        f"sample_coding -s{len(coding)} {coding}\n"
        "end_head\n")
    with open(path, "wb") as f:
        f.write(head.encode().ljust(1024, b" "))
        f.write(payload)


def test_sphere_pcm_little_and_big_endian(tmp_path):
    """TIMIT ships NIST SPHERE; both byte orders read natively (soundfile
    parity, reference speech/utils/wave.py:8-10)."""
    sr = 16000
    audio = (np.sin(np.linspace(0, 220 * 2 * np.pi, sr // 2)) * 12345).astype(
        np.int16)
    for bf in ("01", "10"):
        path = str(tmp_path / f"t_{bf}.sph")
        _write_sphere(path, audio, sr, byte_format=bf)
        back, rate = wave.array_from_wave(path)
        assert rate == sr
        np.testing.assert_array_equal(back, audio)
        assert wave.wav_duration(path) == 0.5


def test_sphere_ulaw(tmp_path):
    """G.711 mu-law SPHERE payload decodes to linear int16."""
    sr = 8000
    # mu-law encode a ramp with the inverse of the decoder's table math
    lin = np.linspace(-30000, 30000, 1000).astype(np.int16)
    # reference mu-law encoder (G.711)
    BIAS, CLIP = 0x84, 32635
    x = lin.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    x = np.clip(np.abs(x), 0, CLIP) + BIAS
    exponent = (np.floor(np.log2(x)) - 7).astype(np.int32)
    mantissa = (x >> (exponent + 3)) & 0x0F
    enc = (~(sign | (exponent << 4) | mantissa)) & 0xFF
    path = str(tmp_path / "t.sph")
    _write_sphere(path, enc.astype(np.uint8), sr, coding="ulaw")
    back, rate = wave.array_from_wave(path)
    assert rate == sr
    # mu-law is lossy: reconstruction within the step size of each segment
    err = np.abs(back.astype(np.int32) - lin.astype(np.int32))
    assert err.max() < 1100, err.max()


def test_sphere_shorten_decodes_and_wavpack_rejected(tmp_path):
    """Embedded-shorten payloads decode natively now (utils/shorten.py;
    round-trip coverage in tests/shorten_test.py) — a garbage payload under
    that coding raises a shorten error, not a convert-with-sph2pipe one.
    wavpack stays rejected with a clear message."""
    import pytest

    path = str(tmp_path / "t.sph")
    _write_sphere(path, np.zeros(10, np.int16), 16000,
                  coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError, match="shorten"):
        wave.array_from_wave(path)  # payload is raw PCM, not a shn stream

    path2 = str(tmp_path / "t2.sph")
    _write_sphere(path2, np.zeros(10, np.int16), 16000,
                  coding="pcm,embedded-wavpack")
    with pytest.raises(ValueError, match="wavpack"):
        wave.array_from_wave(path2)


def test_flac_corrupt_clear_error(tmp_path):
    """FLAC is decoded natively now (utils/flac.py + native/flacdec.cc);
    a corrupt stream must raise a clear error, not return garbage audio."""
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(b"fLaC" + b"\x00" * 64)
    import pytest
    # native decoder raises OSError; the pure-Python fallback raises
    # ValueError/EOFError — all carry a FLAC-specific message
    with pytest.raises((OSError, ValueError, EOFError)):
        wave.array_from_wave(path)
