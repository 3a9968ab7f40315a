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
