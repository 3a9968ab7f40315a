"""Native C++ featurizer (speech_tpu/native/featurizer.cc) parity tests.

The native library must reproduce the numpy reference numerics
(speech_tpu/data/features.py:log_specgram_np, itself validated against
scipy.signal.spectrogram per the reference's log_specgram, speech/
loader.py:156-166) for: wav decode, single-file featurization, normalized
batch featurization through the Loader, and the Bluestein fallback path for
sample rates whose frame length is not 2^a*5^b.
"""

import numpy as np
import pytest

from speech_tpu.data import features as F
from speech_tpu.data.loader import AudioDataset, Loader
from speech_tpu.data.preprocessor import Preprocessor
from speech_tpu.native import featurizer as native
from speech_tpu.utils import wave as W

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native featurizer not built (make native)")


def _write_wav(path, n, sr, seed=0):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal(n) * 3000).astype(np.int16)
    W.write_wave(str(path), audio, sr)
    return audio


def test_wav_info_and_read(tmp_path):
    p = tmp_path / "a.wav"
    audio = _write_wav(p, 12345, 16000)
    sr, n = native.wav_info(str(p))
    assert (sr, n) == (16000, 12345)
    out = np.zeros(12345, dtype=np.float32)
    import ctypes

    lib = native._load()
    got_sr = ctypes.c_int(0)
    m = lib.stpu_wav_read(str(p).encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          12345, ctypes.byref(got_sr))
    assert m == 12345 and got_sr.value == 16000
    np.testing.assert_array_equal(out.astype(np.int16), audio)


@pytest.mark.parametrize("sr", [16000, 8000, 22050])
def test_log_specgram_parity(tmp_path, sr):
    """Mixed-radix path (16 k/8 k) and Bluestein fallback (22.05 k: nperseg
    441 is odd) both match numpy within float32 noise."""
    p = tmp_path / f"u{sr}.wav"
    _write_wav(p, sr + 317, sr, seed=sr)
    ref = F.log_specgram_from_file(str(p))
    nat = native.log_specgram_file(str(p))
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=1e-4, rtol=1e-4)


def test_stereo_parity(tmp_path):
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal((8000, 2)) * 3000).astype(np.int16)
    p = tmp_path / "st.wav"
    W.write_wave(str(p), audio, 16000)
    ref = F.log_specgram_np(audio.astype(np.float64), 16000)
    nat = native.log_specgram_file(str(p))
    np.testing.assert_allclose(nat, ref, atol=1e-4, rtol=1e-4)


def test_num_frames_matches(tmp_path):
    p = tmp_path / "a.wav"
    _write_wav(p, 50000, 16000)
    assert native.num_frames_file(str(p)) == F.num_frames(50000, 16000)


def test_loader_native_batch_parity(tiny_corpus):
    """The Loader's native batch path produces the same batches as the pure
    python path (same shapes, lengths, labels; features within fp32 noise)."""
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False)
    ds = AudioDataset(tiny_corpus["manifest"], preproc, batch_size=3)
    ln = Loader(ds, batch_size=3, seed=5, native=True, num_workers=1)
    lp = Loader(ds, batch_size=3, seed=5, native=False, num_workers=1)
    for bn, bp in zip(ln, lp):
        assert bn["inputs"].shape == bp["inputs"].shape
        np.testing.assert_array_equal(bn["input_lengths"], bp["input_lengths"])
        np.testing.assert_array_equal(bn["labels"], bp["labels"])
        np.testing.assert_array_equal(bn["label_lengths"], bp["label_lengths"])
        np.testing.assert_allclose(bn["inputs"], bp["inputs"], atol=1e-3,
                                   rtol=1e-3)


def test_preprocessor_uses_native(tiny_corpus):
    """Preprocessor.preprocess native fast path matches the numpy fallback."""
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=True)
    row = tiny_corpus["rows"][0]
    feats_nat, ids_nat = preproc.preprocess(row["audio"], row["text"])
    ref = preproc.normalize(F.log_specgram_from_file(row["audio"]))
    ids_ref = preproc.encode(row["text"])
    assert ids_nat == ids_ref
    np.testing.assert_allclose(feats_nat, ref, atol=1e-3, rtol=1e-3)


def test_error_on_missing_file():
    with pytest.raises(IOError):
        native.log_specgram_file("/nonexistent/file.wav")


def _sphere_file(tmp_path, name, audio, sr=16000, byte_format="10",
                 coding="pcm"):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wave_test import _write_sphere

    p = str(tmp_path / name)
    _write_sphere(p, audio, sr, byte_format=byte_format, coding=coding)
    return p


@pytest.mark.parametrize("byte_format", ["01", "10"])
def test_sphere_pcm_native_parity(tmp_path, byte_format):
    """The C++ featurizer reads NIST SPHERE in place (sphere_core.h): info,
    raw samples, and features match the Python path exactly."""
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(9000) * 3000).astype(np.int16)
    p = _sphere_file(tmp_path, f"s{byte_format}.sph", audio,
                     byte_format=byte_format)
    sr, n = native.wav_info(p)
    assert (sr, n) == (16000, 9000)
    ref = F.log_specgram_from_file(p)
    nat = native.log_specgram_file(p)
    np.testing.assert_allclose(nat, ref, atol=1e-4, rtol=1e-4)


def test_sphere_ulaw_native_parity(tmp_path):
    rng = np.random.default_rng(4)
    u = rng.integers(0, 256, 9000).astype(np.uint8)
    p = _sphere_file(tmp_path, "u.sph", u, coding="ulaw")
    ref = F.log_specgram_from_file(p)
    nat = native.log_specgram_file(p)
    np.testing.assert_allclose(nat, ref, atol=1e-4, rtol=1e-4)


def test_sphere_shorten_native_parity(tmp_path):
    """WSJ-style embedded-shorten .wv1 through the NATIVE featurizer: the
    C++ shorten decoder (sphere_core.h) must agree with the Python one
    (utils/shorten.py) sample for sample, and features must match."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from shn_ref_encoder import encode_shn

    rng = np.random.default_rng(5)
    n = 9000
    t = np.arange(n)
    s = np.clip(5000 * np.sin(2 * np.pi * t * 211 / 16000)
                + rng.normal(0, 300, n), -32768, 32767).astype(np.int64)
    payload = encode_shn(s, blocksize=256, nmean=4)
    coding = "pcm,embedded-shorten-v2"
    head = ("NIST_1A\n   1024\n"
            f"sample_count -i {n}\nsample_rate -i 16000\n"
            "channel_count -i 1\nsample_n_bytes -i 2\n"
            "sample_byte_format -s2 10\n"
            f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    p = str(tmp_path / "t.wv1")
    with open(p, "wb") as f:
        f.write(head.encode().ljust(1024, b" ") + payload)

    sr, count = native.wav_info(p)
    assert (sr, count) == (16000, n)
    # raw sample parity: native read vs python decoder
    import ctypes

    lib = native._load()
    out = np.zeros(n, dtype=np.float32)
    got_sr = ctypes.c_int(0)
    m = lib.stpu_wav_read(p.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n, ctypes.byref(got_sr))
    assert m == n
    np.testing.assert_array_equal(out.astype(np.int16), s.astype(np.int16))
    # feature parity end to end
    ref = F.log_specgram_from_file(p)
    nat = native.log_specgram_file(p)
    np.testing.assert_allclose(nat, ref, atol=1e-4, rtol=1e-4)


def test_sphere_shorten_qlpc_quirk_native_parity(tmp_path):
    """The QLPC short-block wrap quirk (see shorten_test) decodes
    identically in the C++ decoder."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from shn_ref_encoder import encode_shn

    rng = np.random.default_rng(6)
    n = 4000
    s = (np.clip(rng.normal(0, 300, n), -3000, 3000) + 900).astype(np.int64)
    payload = encode_shn(s, commands="qlpc", blocksize=2, nmean=1)
    coding = "pcm,embedded-shorten-v2"
    head = ("NIST_1A\n   1024\n"
            f"sample_count -i {n}\nsample_rate -i 16000\n"
            "channel_count -i 1\nsample_n_bytes -i 2\n"
            "sample_byte_format -s2 10\n"
            f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    p = str(tmp_path / "q.wv1")
    with open(p, "wb") as f:
        f.write(head.encode().ljust(1024, b" ") + payload)
    import ctypes

    lib = native._load()
    out = np.zeros(n, dtype=np.float32)
    got_sr = ctypes.c_int(0)
    m = lib.stpu_wav_read(p.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n, ctypes.byref(got_sr))
    assert m == n
    np.testing.assert_array_equal(out.astype(np.int16), s.astype(np.int16))
