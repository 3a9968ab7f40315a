"""Log-spectrogram feature extraction.

Numerically matches the reference's ``log_specgram`` (reference: speech/
loader.py:156-166): scipy ``spectrogram`` with a periodic hann window, 20 ms
window, 10 ms overlap parameter (hop = nperseg - noverlap), PSD scaling,
one-sided spectrum, then ``log(spec.T + 1e-10)`` giving shape ``(time, freq)``
with ``freq = nperseg // 2 + 1`` bins.

Two implementations with identical numerics:
  * :func:`log_specgram_np` — host-side numpy, used by the input pipeline
    workers (validated bit-for-bit against ``scipy.signal.spectrogram`` in
    ``tests/features_test.py``).
  * :func:`log_specgram_batch` — on-device jnp over a padded batch of
    waveforms, used for fused featurization inside a jitted step; framing is a
    reshape+slice pattern XLA lowers well, and the rFFT runs on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WINDOW_MS = 20
DEFAULT_STEP_MS = 10
DEFAULT_EPS = 1e-10


def stft_params(sample_rate: int, window_ms: int = DEFAULT_WINDOW_MS,
                step_ms: int = DEFAULT_STEP_MS) -> tuple[int, int]:
    """(nperseg, hop) in samples. hop = nperseg - noverlap as in the reference."""
    nperseg = int(window_ms * sample_rate / 1e3)
    noverlap = int(step_ms * sample_rate / 1e3)
    return nperseg, nperseg - noverlap


def num_frames(n_samples: int, sample_rate: int, window_ms: int = DEFAULT_WINDOW_MS,
               step_ms: int = DEFAULT_STEP_MS) -> int:
    """Number of STFT frames produced for a signal of ``n_samples``."""
    nperseg, hop = stft_params(sample_rate, window_ms, step_ms)
    if n_samples < nperseg:
        return 0
    return 1 + (n_samples - nperseg) // hop


def feature_dim(sample_rate: int, window_ms: int = DEFAULT_WINDOW_MS) -> int:
    """Number of one-sided frequency bins (nperseg // 2 + 1)."""
    nperseg = int(window_ms * sample_rate / 1e3)
    return nperseg // 2 + 1


def _hann_periodic(n: int) -> np.ndarray:
    """Periodic hann window, matching scipy.signal.get_window('hann', n)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _power_specgram_np(audio: np.ndarray, sample_rate: int,
                       window_ms: int = DEFAULT_WINDOW_MS,
                       step_ms: int = DEFAULT_STEP_MS) -> np.ndarray:
    """Host-side one-sided PSD (scipy 'density' scaling), shape (time, freq)."""
    nperseg, hop = stft_params(sample_rate, window_ms, step_ms)
    audio = np.asarray(audio, dtype=np.float64)
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    t = num_frames(audio.shape[0], sample_rate, window_ms, step_ms)
    if t == 0:
        raise ValueError(
            f"Audio shorter than one window ({audio.shape[0]} < {nperseg} samples)")
    win = _hann_periodic(nperseg)
    idx = np.arange(nperseg)[None, :] + hop * np.arange(t)[:, None]
    frames = audio[idx] * win
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    # scipy 'density' PSD scaling with one-sided doubling (DC and, for even
    # nperseg, Nyquist are not doubled).
    scale = 1.0 / (sample_rate * (win * win).sum())
    spec *= scale
    last = spec.shape[-1] - 1 if nperseg % 2 == 0 else spec.shape[-1]
    spec[:, 1:last] *= 2.0
    return spec


def log_specgram_np(audio: np.ndarray, sample_rate: int,
                    window_ms: int = DEFAULT_WINDOW_MS,
                    step_ms: int = DEFAULT_STEP_MS,
                    eps: float = DEFAULT_EPS) -> np.ndarray:
    """Host-side log power-spectrogram, shape (time, freq), float32."""
    spec = _power_specgram_np(audio, sample_rate, window_ms, step_ms)
    return np.log(spec.astype(np.float32) + np.float32(eps))


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_mels: int,
                   window_ms: int = DEFAULT_WINDOW_MS,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Triangular mel filterbank, shape (n_bins, n_mels), float32.

    Standard HTK-style mel triangles over the one-sided rFFT bins of the
    framework's STFT (nperseg = window_ms at sample_rate). Used by the
    log-mel feature option (the reference has only the raw log spectrogram,
    speech/loader.py:156-166; mel is this framework's extension and the
    usual front end for larger corpora)."""
    nperseg = int(window_ms * sample_rate / 1e3)
    n_bins = nperseg // 2 + 1
    if fmax is None:
        fmax = sample_rate / 2.0
    mels = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz = _mel_to_hz(mels)
    bins = np.fft.rfftfreq(nperseg, 1.0 / sample_rate)
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz[m], hz[m + 1], hz[m + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def log_mel_np(audio: np.ndarray, sample_rate: int, n_mels: int,
               window_ms: int = DEFAULT_WINDOW_MS,
               step_ms: int = DEFAULT_STEP_MS,
               eps: float = DEFAULT_EPS) -> np.ndarray:
    """Host-side log-mel features, shape (time, n_mels), float32."""
    spec = _power_specgram_np(audio, sample_rate, window_ms, step_ms)
    fb = mel_filterbank(sample_rate, n_mels, window_ms)
    mel = spec.astype(np.float32) @ fb
    return np.log(mel + np.float32(eps))


def log_specgram_from_file(audio_file: str, **kwargs) -> np.ndarray:
    """Read a wav and featurize it (reference loader.py:152-154)."""
    from speech_tpu.utils import wave

    audio, sr = wave.array_from_wave(audio_file)
    return log_specgram_np(audio, sr, **kwargs)


def _power_specgram_batch(audio: jax.Array, sample_rate: int,
                          window_ms: int = DEFAULT_WINDOW_MS,
                          step_ms: int = DEFAULT_STEP_MS) -> jax.Array:
    """On-device one-sided PSD over a padded batch: (B, S) -> (B, T, F)."""
    nperseg, hop = stft_params(sample_rate, window_ms, step_ms)
    b, s = audio.shape
    t = 1 + (s - nperseg) // hop
    win = jnp.asarray(_hann_periodic(nperseg), dtype=jnp.float32)
    starts = hop * jnp.arange(t)

    def frame_one(x):
        # (T, nperseg) gather; XLA fuses this into the windowing multiply.
        idx = starts[:, None] + jnp.arange(nperseg)[None, :]
        return x[idx]

    frames = jax.vmap(frame_one)(audio.astype(jnp.float32)) * win
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    scale = 1.0 / (sample_rate * jnp.sum(win * win))
    spec = spec * scale
    nbins = nperseg // 2 + 1
    doubling = jnp.ones((nbins,), jnp.float32)
    last = nbins - 1 if nperseg % 2 == 0 else nbins
    doubling = doubling.at[1:last].set(2.0)
    return spec * doubling


@functools.partial(jax.jit, static_argnames=("sample_rate", "window_ms", "step_ms"))
def log_specgram_batch(audio: jax.Array, sample_rate: int,
                       window_ms: int = DEFAULT_WINDOW_MS,
                       step_ms: int = DEFAULT_STEP_MS,
                       eps: float = DEFAULT_EPS) -> jax.Array:
    """On-device log power-spectrogram over a padded batch.

    Args:
      audio: (B, S) float32 waveform batch, zero-padded past each utterance's
        true length (padding frames produce log(eps) energy and are masked
        downstream via frame lengths).

    Returns:
      (B, T, F) float32 with T = num_frames(S) and F = nperseg//2 + 1.
    """
    spec = _power_specgram_batch(audio, sample_rate, window_ms, step_ms)
    return jnp.log(spec + jnp.float32(eps))


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "n_mels", "window_ms",
                                    "step_ms"))
def log_mel_batch(audio: jax.Array, sample_rate: int, n_mels: int,
                  window_ms: int = DEFAULT_WINDOW_MS,
                  step_ms: int = DEFAULT_STEP_MS,
                  eps: float = DEFAULT_EPS) -> jax.Array:
    """On-device log-mel features over a padded batch: (B, S) -> (B, T, M).
    The mel projection is one (B*T, F) x (F, M) MXU matmul."""
    spec = _power_specgram_batch(audio, sample_rate, window_ms, step_ms)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_mels, window_ms))
    return jnp.log(spec @ fb + jnp.float32(eps))
