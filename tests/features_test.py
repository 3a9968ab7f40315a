"""Feature extraction parity tests.

The host numpy implementation must match scipy.signal.spectrogram (which the
reference calls directly, reference loader.py:156-166); the on-device jnp
implementation must match the numpy one.
"""

import numpy as np
import pytest
import scipy.signal

from speech_tpu.data import features as F


def _scipy_log_specgram(audio, sample_rate, window_size=20, step_size=10, eps=1e-10):
    """The reference's exact recipe, reproduced here only as test oracle."""
    nperseg = int(window_size * sample_rate / 1e3)
    noverlap = int(step_size * sample_rate / 1e3)
    _, _, spec = scipy.signal.spectrogram(
        audio, fs=sample_rate, window="hann", nperseg=nperseg,
        noverlap=noverlap, detrend=False)
    return np.log(spec.T.astype(np.float32) + eps)


@pytest.mark.parametrize("sr", [8000, 16000])
@pytest.mark.parametrize("dur", [0.05, 0.317, 1.0])
def test_log_specgram_matches_scipy(sr, dur):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(sr * dur)) * 8000).astype(np.int16)
    ours = F.log_specgram_np(audio, sr)
    ref = _scipy_log_specgram(audio, sr)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    assert ours.dtype == np.float32
    assert ours.shape[1] == F.feature_dim(sr)
    assert ours.shape[0] == F.num_frames(len(audio), sr)


def test_log_specgram_batch_matches_np():
    sr = 16000
    rng = np.random.default_rng(1)
    lens = [4000, 5600]
    s_pad = 6400
    batch = np.zeros((2, s_pad), np.float32)
    for i, n in enumerate(lens):
        batch[i, :n] = (rng.standard_normal(n) * 1000).astype(np.int16)
    out = np.asarray(F.log_specgram_batch(batch, sr))
    assert out.shape == (2, F.num_frames(s_pad, sr), F.feature_dim(sr))
    for i, n in enumerate(lens):
        t = F.num_frames(n, sr)
        ref = F.log_specgram_np(batch[i, :n], sr)
        np.testing.assert_allclose(out[i, :t], ref, rtol=2e-4, atol=2e-4)


def test_too_short_raises():
    with pytest.raises(ValueError):
        F.log_specgram_np(np.zeros(10, np.int16), 16000)
