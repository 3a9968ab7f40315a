"""Shorten (SHN) decoder tests: hand-written bit-level vectors pin the code
conventions straight from the format spec; round-trips against the
independent test encoder (tests/shn_ref_encoder.py) cover the predictors,
offsets, bitshift, multichannel, and the SPHERE embedding WSJ uses."""

import numpy as np
import pytest

from speech_tpu.utils import shorten as shn
from speech_tpu.utils import wave as wav_util

from shn_ref_encoder import BitWriter, encode_shn


# --- bit-level primitives, hand-checked against the spec -------------------


def test_bitreader_uvar_hand_vector():
    """uvar(k): unary 0s terminated by a 1, then k literal MSB-first bits.
    Bits 001 10 == uvar(2) of (2 zeros -> count 2) << 2 | 0b10 = 10."""
    # byte: 0b00110_000
    br = shn._BitReader(bytes([0b00110000]))
    assert br.uvar(2) == 10


def test_bitreader_var_zigzag_hand_vector():
    """var(k) = zigzag uvar(k+1): low bit is the sign; 0,1,2,3,4 ->
    0,-1,1,-2,2."""
    w = BitWriter()
    for u in range(5):
        w.uvar(u, 1)
    br = shn._BitReader(w.tobytes())
    assert [br.var(0) for _ in range(5)] == [0, -1, 1, -2, 2]


def test_bitreader_ulong_hand_vector():
    """ulong = uvar(uvar(2)). Value 5 with nbit=3: uvar(3,2)='1 11' then
    uvar(5,3)='1 101'."""
    br = shn._BitReader(bytes([0b11111010]))
    assert br.ulong() == 5


def test_hand_built_diff1_stream():
    """A stream written bit-by-bit from the spec (not via encode_shn):
    version 2, TYPE_S16HL, 1 channel, blocksize 4, nmean 0, DIFF1 over
    samples [3, 5, 4, 4] (residuals vs previous: 3, 2, -1, 0), then QUIT."""
    w = BitWriter()
    w.ulong(3)   # ftype S16HL
    w.ulong(1)   # nchan
    w.ulong(4)   # blocksize
    w.ulong(0)   # maxnlpc
    w.ulong(0)   # nmean
    w.ulong(0)   # nskip
    w.uvar(shn.FN_DIFF1, shn.FNSIZE)
    w.uvar(1, shn.ENERGYSIZE)  # resn = 1
    for r in (3, 2, -1, 0):
        w.var(r, 1)
    w.uvar(shn.FN_QUIT, shn.FNSIZE)
    data = shn.MAGIC + bytes([2]) + w.tobytes()
    audio, info = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, np.asarray([3, 5, 4, 4], np.int16))
    assert info["nchan"] == 1 and info["version"] == 2


def test_hand_built_qlpc_version_offset():
    """QLPC's prediction initializer is version-gated (shorten.c's
    V2LPCQOFFSET): version >= 2 seeds the accumulator with 1 << LPCQUANT,
    earlier versions with 0. Hand-built stream, NOT via the test encoder:
    nlpc=1, coefficient 32 (== 1.0 at LPCQUANT=5), residuals [5, 7],
    zero warmup -> v2 decodes [6, 14], v1 decodes [5, 12]."""
    def build(version):
        w = BitWriter()
        w.ulong(3)   # ftype S16HL
        w.ulong(1)   # nchan
        w.ulong(2)   # blocksize
        w.ulong(1)   # maxnlpc
        w.ulong(0)   # nmean
        w.ulong(0)   # nskip
        w.uvar(shn.FN_QLPC, shn.FNSIZE)
        w.uvar(2, shn.ENERGYSIZE)       # resn
        w.uvar(1, shn.LPCQSIZE)         # nlpc = 1
        w.var(32, shn.LPCQUANT)         # coefficient 1.0
        w.var(5, 2)
        w.var(7, 2)
        w.uvar(shn.FN_QUIT, shn.FNSIZE)
        return shn.MAGIC + bytes([version]) + w.tobytes()

    audio2, _ = shn.decode_shorten(build(2))
    np.testing.assert_array_equal(audio2, np.asarray([6, 14], np.int16))
    audio1, _ = shn.decode_shorten(build(1))
    np.testing.assert_array_equal(audio1, np.asarray([5, 12], np.int16))


def test_hand_built_negative_mean_c_division():
    """Block means use C-style truncation toward zero, not Python floor:
    a DIFF0 stream with nmean=1 whose first block sums to a negative
    non-multiple of blocksize. Block 0 = [-3, -3, -2, -3] (sum -11, +2 v2
    bias -> -9; C: -9/4 = -2, floor would give -3). Block 1's residuals are
    relative to coffset -2, so sample = res + (-2)."""
    w = BitWriter()
    w.ulong(3)   # ftype
    w.ulong(1)   # nchan
    w.ulong(4)   # blocksize
    w.ulong(0)   # maxnlpc
    w.ulong(1)   # nmean = 1
    w.ulong(0)   # nskip
    w.uvar(shn.FN_DIFF0, shn.FNSIZE)
    w.uvar(2, shn.ENERGYSIZE)
    for r in (-3, -3, -2, -3):  # coffset 0 for the first block
        w.var(r, 2)
    w.uvar(shn.FN_DIFF0, shn.FNSIZE)
    w.uvar(2, shn.ENERGYSIZE)
    for r in (0, 1, 2, 3):  # + coffset (-2 with C division; -3 if floored)
        w.var(r, 2)
    w.uvar(shn.FN_QUIT, shn.FNSIZE)
    data = shn.MAGIC + bytes([2]) + w.tobytes()
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(
        audio, np.asarray([-3, -3, -2, -3, -2, -1, 0, 1], np.int16))


# --- round trips through the reference encoder -----------------------------


def _sig(n, seed=0, amp=5000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * t * 173 / 16000) + rng.normal(0, 250, n)
    return np.clip(x, -32768, 32767).astype(np.int64)


@pytest.mark.parametrize("cmd", ["auto", "diff0", "diff1", "diff2", "diff3",
                                 "qlpc"])
def test_roundtrip_commands(cmd):
    s = _sig(777)  # odd length: exercises FN_BLOCKSIZE for the tail
    data = encode_shn(s, commands=cmd, blocksize=64, nmean=4)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_roundtrip_qlpc_short_block_wrap_quirk():
    """QLPC blocks SHORTER than the warmup with a nonzero mean offset:
    shorten.c wraps its in-place buffer, so the reached-back warmup entries
    keep the coffset subtraction — encoder and both decoders model the
    quirk identically (blocksize 2 < nwrap 3, nmean 1)."""
    s = (_sig(40, seed=13) // 8 + 900).astype(np.int64)  # bias -> coffset!=0
    data = encode_shn(s, commands="qlpc", blocksize=2, nmean=1)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_roundtrip_zero_blocks_and_nmean0():
    s = np.zeros(300, np.int64)
    data = encode_shn(s, commands="zero", nmean=0)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, np.zeros(300, np.int16))


def test_roundtrip_v1_offsets():
    """Version 1 stores un-shifted means and uses no rounding constant."""
    s = _sig(500, seed=3) + 1200  # bias so the mean offsets matter
    s = np.clip(s, -32768, 32767)
    data = encode_shn(s, version=1, commands="diff0", nmean=4)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_roundtrip_bitshift():
    """FN_BITSHIFT: samples with low zero bits coded in the shifted domain
    (v2 stores block means << bitshift; offsets round back down)."""
    s = (_sig(512, seed=4) // 4) * 4
    data = encode_shn(s, bitshift_at=2, bitshift=2, blocksize=64, nmean=4)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_roundtrip_stereo():
    l = _sig(400, seed=5)
    r = _sig(400, seed=6, amp=2000)
    s = np.stack([l, r], axis=1)
    data = encode_shn(s, blocksize=32, nmean=4)
    audio, info = shn.decode_shorten(data)
    assert info["nchan"] == 2
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_roundtrip_ulaw_and_u8():
    rng = np.random.default_rng(7)
    u = rng.integers(0, 256, 320).astype(np.int64)
    data = encode_shn(u, ftype=shn.TYPE_ULAW, nmean=0, blocksize=64)
    audio, _ = shn.decode_shorten(data)
    expect = wav_util._ulaw_decode(u.astype(np.uint8))
    np.testing.assert_array_equal(audio, expect)

    b = rng.integers(0, 256, 320).astype(np.int64)
    data = encode_shn(b, ftype=shn.TYPE_U8, nmean=4, blocksize=64)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio,
                                  ((b - 0x80) << 8).astype(np.int16))


def test_verbatim_and_skip_bytes_ignored():
    s = _sig(200, seed=8)
    data = encode_shn(s, verbatim=b"NIST_1A header junk",
                      nskip_bytes=b"\x00\x01", blocksize=64)
    audio, _ = shn.decode_shorten(data)
    np.testing.assert_array_equal(audio, s.astype(np.int16))


def test_hostile_size_fields_rejected():
    """Corrupt/hostile size fields fail with clear errors instead of
    gigabyte allocations: huge block size and huge Rice parameter."""
    def header(blocksize):
        w = BitWriter()
        w.ulong(3); w.ulong(1); w.ulong(blocksize)
        w.ulong(0); w.ulong(0); w.ulong(0)
        return w

    w = header(1 << 23)
    with pytest.raises(ValueError, match="block size"):
        shn.decode_shorten(shn.MAGIC + bytes([2]) + w.tobytes())

    w = header(64)
    w.uvar(shn.FN_DIFF1, shn.FNSIZE)
    w.uvar(60, shn.ENERGYSIZE)  # resn 60 > any real sample width
    with pytest.raises(ValueError, match="residual size"):
        shn.decode_shorten(shn.MAGIC + bytes([2]) + w.tobytes())


def test_corrupt_stream_clear_errors():
    with pytest.raises(ValueError, match="magic"):
        shn.decode_shorten(b"nope" + b"\x00" * 16)
    with pytest.raises(ValueError, match="version"):
        shn.decode_shorten(shn.MAGIC + bytes([9]) + b"\x00" * 16)
    s = _sig(100, seed=9)
    data = encode_shn(s, blocksize=64)
    with pytest.raises(ValueError, match="truncated|malformed"):
        shn.decode_shorten(data[: len(data) // 2])


# --- the WSJ embedding: SPHERE container with embedded-shorten payload -----


def _sphere_shn_file(tmp_path, samples, coding="pcm,embedded-shorten-v2"):
    payload = encode_shn(samples, blocksize=64, nmean=4)
    n = len(samples)
    header = (f"NIST_1A\n   1024\nsample_rate -i 16000\n"
              f"sample_count -i {n}\nchannel_count -i 1\n"
              f"sample_n_bytes -i 2\nsample_byte_format -s2 10\n"
              f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    blob = header.encode().ljust(1024, b" ") + payload
    path = str(tmp_path / "t.wv1")
    with open(path, "wb") as f:
        f.write(blob)
    return path


def test_sphere_embedded_shorten_reads_in_place(tmp_path):
    s = _sig(700, seed=10)
    path = _sphere_shn_file(tmp_path, s)
    audio, rate = wav_util.array_from_wave(path)
    assert rate == 16000
    np.testing.assert_array_equal(audio, s.astype(np.int16))
    assert wav_util.wav_duration(path) == pytest.approx(700 / 16000)


def test_sphere_shorten_count_mismatch_raises(tmp_path):
    s = _sig(100, seed=11)
    path = _sphere_shn_file(tmp_path, s)
    with open(path, "r+b") as f:
        hdr = f.read(1024).decode()
        f.seek(0)
        f.write(hdr.replace("sample_count -i 100",
                            "sample_count -i 999").encode())
    with pytest.raises(ValueError, match="promises"):
        wav_util.array_from_wave(path)
