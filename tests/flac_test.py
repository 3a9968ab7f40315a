"""FLAC decoding: round-trip the test-only reference encoder through the
pure-Python decoder (speech_tpu.utils.flac) and, when built, the native C++
decoder — exact PCM equality in both.

The reference reads FLAC via soundfile (reference speech/utils/wave.py:8-10);
this framework decodes the container itself so the LibriSpeech recipe needs
no external conversion tools.

Known limitation of this suite: conformance is established by round-tripping
the in-repo test encoder, so a MATCHED encoder/decoder misreading of the spec
would pass. The ideal pin — a committed libFLAC-encoded fixture with expected
PCM — cannot be generated on this machine (no libFLAC, soundfile, ffmpeg, or
flac binary; zero egress). If a real fixture becomes available, add it here
and assert both decoders reproduce its PCM exactly.
"""

import os

import numpy as np
import pytest

from speech_tpu.utils import flac as pyflac
from speech_tpu.utils import wave as wav_util

from flac_ref_encoder import encode_flac


def _signal(n=1000, seed=0, amp=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = (amp * np.sin(2 * np.pi * t * 220 / 16000)
         + rng.normal(0, 300, size=n))
    return np.clip(x, -32768, 32767).astype(np.int64)


def _roundtrip(tmp_path, samples, sr=16000, **kw):
    data = encode_flac(samples, sr, **kw)
    path = os.path.join(tmp_path, "t.flac")
    with open(path, "wb") as f:
        f.write(data)
    audio, rate = pyflac.read_flac(path)
    assert rate == sr
    return path, audio


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4", "lpc1", "lpc4", "lpc8"])
def test_mono_roundtrip_modes(tmp_path, mode):
    s = _signal(777)  # odd length: final frame is partial
    _, audio = _roundtrip(str(tmp_path), s, mode=mode, blocksize=256)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_constant_subframe(tmp_path):
    s = np.full(512, -1234, np.int64)
    _, audio = _roundtrip(str(tmp_path), s, mode="constant")
    np.testing.assert_array_equal(audio, s.astype(np.int16))


@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side",
                                    "mid_side"])
def test_stereo_decorrelation(tmp_path, stereo):
    left = _signal(600, seed=1)
    right = _signal(600, seed=2, amp=9000)
    s = np.stack([left, right], axis=1)
    _, audio = _roundtrip(str(tmp_path), s, stereo=stereo, mode="fixed2")
    assert audio.shape == (600, 2)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_rice5_partitions_and_escape(tmp_path):
    s = _signal(1024, seed=3)
    _, audio = _roundtrip(str(tmp_path), s, mode="fixed1", plen=5, porder=2)
    np.testing.assert_array_equal(audio, s.astype(np.int16))
    # Escape-coded partitions: residuals stored raw. fixed1 residuals of a
    # 16-bit signal fit comfortably in 18 bits.
    _, audio = _roundtrip(str(tmp_path), s, mode="fixed1", porder=1,
                          escape_raw_bits=18)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_wasted_bits(tmp_path):
    s = (_signal(500, seed=4) >> 2) << 2  # bottom 2 bits zero
    _, audio = _roundtrip(str(tmp_path), s, mode="fixed2", wasted=2)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


@pytest.mark.parametrize("bits,shift", [(8, 8), (24, -8)])
def test_sample_widths_rescaled_to_int16(tmp_path, bits, shift):
    s16 = _signal(400, seed=5)
    native = (s16 >> 8) if bits == 8 else (s16 << 8)
    _, audio = _roundtrip(str(tmp_path), native, bits=bits, mode="verbatim")
    expect = (native << shift) if shift > 0 else (native >> -shift)
    np.testing.assert_array_equal(audio, expect.astype(np.int16))


def test_flac_info_and_duration(tmp_path):
    s = _signal(1600)
    path, _ = _roundtrip(str(tmp_path), s, mode="fixed2")
    info = pyflac.flac_info(path)
    assert info["sample_rate"] == 16000
    assert info["channels"] == 1
    assert info["bits"] == 16
    assert info["total_samples"] == 1600
    assert wav_util.wav_duration(path) == pytest.approx(0.1)


def test_truncated_metadata_clear_error(tmp_path):
    """Truncated/corrupt metadata raises ValueError with a clear message in
    the PURE-PYTHON path too (not a bare IndexError) — the fallback
    configuration is exactly the one the fallback exists for."""
    s = _signal(400)
    data = encode_flac(s, 16000)
    for cut in (5, 7, 20):  # mid block header / mid STREAMINFO body
        path = str(tmp_path / f"cut{cut}.flac")
        with open(path, "wb") as f:
            f.write(data[:cut])
        with pytest.raises(ValueError, match="[Tt]runcated"):
            pyflac.flac_info(path)
        with pytest.raises(ValueError, match="[Tt]runcated"):
            pyflac.read_flac(path)
    # zero-length STREAMINFO (the wave_test corrupt fixture): clear error
    path = str(tmp_path / "zero.flac")
    with open(path, "wb") as f:
        f.write(b"fLaC" + b"\x00" * 64)
    with pytest.raises(ValueError, match="STREAMINFO"):
        pyflac.read_flac(path)


def _splice_padding(data: bytes, pad_len: int) -> bytes:
    """Insert a PADDING metadata block after STREAMINFO (clearing its
    last-metadata flag)."""
    si_len = int.from_bytes(data[5:8], "big")
    end = 8 + si_len
    head = bytearray(data[:end])
    head[4] &= 0x7F  # STREAMINFO is no longer the last metadata block
    pad = bytes([0x81]) + pad_len.to_bytes(3, "big") + b"\x00" * pad_len
    return bytes(head) + pad + data[end:]


def test_flac_info_large_metadata(tmp_path):
    """Metadata beyond any fixed head size (e.g. embedded artwork) parses:
    flac_info walks block headers incrementally instead of reading a 64 KiB
    prefix."""
    s = _signal(800, seed=11)
    data = _splice_padding(encode_flac(s, 16000), 90_000)  # > 64 KiB
    path = str(tmp_path / "bigmeta.flac")
    with open(path, "wb") as f:
        f.write(data)
    info = pyflac.flac_info(path)
    assert info["total_samples"] == 800
    audio, rate = pyflac.read_flac(path)
    assert rate == 16000
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_unknown_total_samples(tmp_path):
    """total_samples == 0 is legal ("unknown"): decoding works (both
    decoders, the native one growing its buffer), while header-only duration
    raises a clear error instead of reporting 0.0 s."""
    s = _signal(700, seed=12)
    data = bytearray(encode_flac(s, 16000))
    si_len = int.from_bytes(data[5:8], "big")
    body = data[8:8 + si_len]
    v = int.from_bytes(body[10:18], "big") & ~((1 << 36) - 1)
    data[8 + 10:8 + 18] = v.to_bytes(8, "big")
    path = str(tmp_path / "unk.flac")
    with open(path, "wb") as f:
        f.write(bytes(data))
    assert pyflac.flac_info(path)["total_samples"] == 0
    audio, _ = pyflac.read_flac(path)
    np.testing.assert_array_equal(audio, s.astype(np.int16))
    with pytest.raises(ValueError, match="total_samples"):
        wav_util.wav_duration(path)
    from speech_tpu.native import flacdec as native
    if native.available():
        na, _ = native.read_flac(path)
        np.testing.assert_array_equal(na, s.astype(np.int16))


def test_array_from_wave_dispatches_flac(tmp_path):
    s = _signal(800, seed=6)
    path, _ = _roundtrip(str(tmp_path), s, mode="lpc4")
    audio, rate = wav_util.array_from_wave(path)
    assert rate == 16000
    assert audio.dtype == np.int16
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_native_decoder_parity(tmp_path):
    from speech_tpu.native import flacdec as native
    if not native.available():
        pytest.skip("native flac decoder not built")
    rng = np.random.default_rng(7)
    for mode, stereo, plen, porder in [
            ("fixed2", "independent", 4, 0),
            ("lpc6", "mid_side", 5, 2),
            ("verbatim", "left_side", 4, 0),
            ("fixed4", "right_side", 4, 1)]:
        n = int(rng.integers(400, 1200))
        s = np.stack([_signal(n, seed=int(rng.integers(1 << 30))),
                      _signal(n, seed=int(rng.integers(1 << 30)), amp=7000)],
                     axis=1)
        data = encode_flac(s, 16000, mode=mode, stereo=stereo, plen=plen,
                           porder=porder, blocksize=256)
        path = os.path.join(str(tmp_path), "p.flac")
        with open(path, "wb") as f:
            f.write(data)
        got_py, sr_py = pyflac.read_flac(path)
        got_c, sr_c = native.read_flac(path)
        assert sr_py == sr_c == 16000
        np.testing.assert_array_equal(got_py, got_c)
        np.testing.assert_array_equal(got_py, s.astype(np.int16))


def test_native_featurizer_reads_flac(tmp_path):
    """The GIL-free batch featurizer decodes FLAC in place: identical PCM
    through a .wav and a .flac must produce bit-identical features (so
    LibriSpeech manifests can point at the corpus's own .flac files)."""
    from speech_tpu.native import featurizer as native
    if not native.available():
        pytest.skip("native featurizer not built")
    from speech_tpu.utils import wave as wav_util_mod

    s = _signal(16000, seed=8)  # 1 s at 16 kHz
    wav_path = os.path.join(str(tmp_path), "a.wav")
    flac_path = os.path.join(str(tmp_path), "a.flac")
    wav_util_mod.write_wave(wav_path, s.astype(np.int16), 16000)
    with open(flac_path, "wb") as f:
        f.write(encode_flac(s, 16000, mode="fixed2", blocksize=4096))

    assert native.wav_info(flac_path) == (16000, 16000)
    t = native.num_frames_file(flac_path)
    assert t == native.num_frames_file(wav_path)
    feats_wav, lens_wav = native.featurize_batch([wav_path], t, 161)
    feats_flac, lens_flac = native.featurize_batch([flac_path], t, 161)
    assert lens_wav[0] == lens_flac[0] == t
    np.testing.assert_array_equal(feats_wav, feats_flac)


def test_loader_end_to_end_on_flac_corpus(tmp_path):
    """Full pipeline on a FLAC-only corpus: Preprocessor fit + Loader batches
    must match the identical corpus stored as wav (the LibriSpeech-in-place
    story, reference examples/librispeech/preprocess.py's conversion made
    unnecessary)."""
    import json as json_mod

    from speech_tpu.data.loader import AudioDataset, Loader
    from speech_tpu.data.preprocessor import Preprocessor
    from speech_tpu.utils import wave as wav_util_mod

    sr = 16000
    texts = ["ab", "bca", "ca b", "abc"]
    manifests = {}
    for ext in ("wav", "flac"):
        rows = []
        for i, text in enumerate(texts):
            s = _signal(4800 + 320 * i, seed=20 + i, amp=8000)
            path = os.path.join(str(tmp_path), f"u{i}.{ext}")
            if ext == "wav":
                wav_util_mod.write_wave(path, s.astype(np.int16), sr)
            else:
                with open(path, "wb") as f:
                    f.write(encode_flac(s, sr, mode="fixed2"))
            rows.append({"text": text, "duration": len(s) / sr, "audio": path})
        manifest = os.path.join(str(tmp_path), f"data_{ext}.json")
        with open(manifest, "w") as f:
            for r in rows:
                f.write(json_mod.dumps(r) + "\n")
        manifests[ext] = manifest

    batches = {}
    for ext, manifest in manifests.items():
        preproc = Preprocessor(manifest, max_samples=4, seed=0)
        ds = AudioDataset(manifest, preproc, batch_size=4)
        loader = Loader(ds, batch_size=4, seed=0)
        batches[ext] = next(iter(loader))
    for key in ("inputs", "input_lengths", "labels", "label_lengths"):
        np.testing.assert_array_equal(batches["wav"][key], batches["flac"][key])
