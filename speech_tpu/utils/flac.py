"""Pure-Python FLAC decoder (container + all subframe types).

Why: the reference reads FLAC through ``soundfile``/libsndfile (reference
speech/utils/wave.py:8-10), which made its LibriSpeech recipe depend on an
up-front flac->wav conversion only when soundfile was absent. This framework
has no libsndfile; instead FLAC is decoded natively — this module is the
readable reference implementation and import-free fallback, and
``speech_tpu/native/flacdec.cc`` is the fast C++ path used by the data
pipeline (parity-tested against this one in tests/flac_test.py).

Scope: the full FLAC bitstream as emitted by the reference encoder —
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, 4- and 5-bit Rice
partitions with escape codes, wasted bits, all stereo decorrelation modes
(left/side, right/side, mid/side), 8/12/16/20/24-bit sample sizes, variable
and fixed blocking. Frame CRCs are parsed but not verified (decode errors
surface as exceptions regardless); the STREAMINFO MD5 is ignored.
"""

from __future__ import annotations

import numpy as np

__all__ = ["flac_info", "read_flac"]


class _Bits:
    """Big-endian bit reader over an in-memory buffer."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        p, d = self.pos, self.data
        end = p + n
        if end > 8 * len(d):
            raise EOFError("FLAC bitstream truncated")
        # Gather the covering bytes, then shift out the tail.
        first, last = p >> 3, (end + 7) >> 3
        v = int.from_bytes(d[first:last], "big")
        v >>= (last << 3) - end
        self.pos = end
        return v & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Number of 0 bits before the next 1 bit (which is consumed)."""
        d = self.data
        n = 0
        p = self.pos
        total = 8 * len(d)
        while True:
            if p >= total:
                raise EOFError("FLAC bitstream truncated in unary code")
            byte = d[p >> 3]
            rem = 8 - (p & 7)
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                n += rem
                p += rem
                continue
            lead = rem - chunk.bit_length()
            n += lead
            p += lead + 1
            self.pos = p
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_num(br: _Bits) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("invalid UTF-8-coded number in frame header")
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid UTF-8 continuation in frame header")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    per = blocksize >> porder
    for p in range(nparts):
        cnt = per - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("partition order too large for predictor order")
        param = br.read(plen)
        if param == escape:
            nbits = br.read(5)
            if nbits:
                out.extend(br.read_signed(nbits) for _ in range(cnt))
            else:
                out.extend([0] * cnt)
        else:
            rd_u, rd = br.read_unary, br.read
            for _ in range(cnt):
                q = rd_u()
                v = (q << param) | rd(param) if param else q
                out.append((v >> 1) ^ -(v & 1))
    return out


def _predict(order_coefs: list[int], shift: int, warm: list[int],
             resid: list[int]) -> list[int]:
    """Restore samples from residuals with an IIR predictor (exact ints)."""
    s = list(warm)
    order = len(order_coefs)
    for r in resid:
        acc = 0
        for j, c in enumerate(order_coefs):
            acc += c * s[-1 - j]
        s.append(r + (acc >> shift))
    return s[:]


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    bps_eff = bps - wasted
    if sftype == 0:  # CONSTANT
        out = [br.read_signed(bps_eff)] * blocksize
    elif sftype == 1:  # VERBATIM
        out = [br.read_signed(bps_eff) for _ in range(blocksize)]
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype - 8
        warm = [br.read_signed(bps_eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = _predict(_FIXED_COEFS[order], 0, warm, resid)
    elif sftype >= 32:  # LPC
        order = (sftype & 31) + 1
        warm = [br.read_signed(bps_eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = _predict(coefs, shift, warm, resid)
    else:
        raise ValueError(f"reserved subframe type {sftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_frame(br: _Bits, info: dict) -> np.ndarray:
    """One frame -> (blocksize, channels) int32."""
    if br.read(14) != 0x3FFE:
        raise ValueError("lost frame sync")
    br.read(1)  # reserved
    br.read(1)  # blocking strategy (the coded number is not used here)
    bs_code = br.read(4)
    sr_code = br.read(4)
    chan_code = br.read(4)
    ss_code = br.read(3)
    br.read(1)  # reserved
    _read_utf8_num(br)
    if bs_code == 0:
        raise ValueError("reserved block size code 0")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_FIXED[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise ValueError("invalid sample rate code")
    bps = info["bits"] if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
    if bps is None:
        raise ValueError(f"reserved sample size code {ss_code}")
    br.read(8)  # header CRC-8 (not verified)

    if chan_code < 8:
        nch = chan_code + 1
        chans = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
    elif chan_code in (8, 9, 10):
        side_first = chan_code == 9
        bps0 = bps + (1 if side_first else 0)
        bps1 = bps + (0 if side_first else 1)
        c0 = _decode_subframe(br, blocksize, bps0)
        c1 = _decode_subframe(br, blocksize, bps1)
        if chan_code == 8:  # left/side
            left = c0
            right = [l - s for l, s in zip(c0, c1)]
        elif chan_code == 9:  # side/right
            right = c1
            left = [s + r for s, r in zip(c0, c1)]
        else:  # mid/side
            left, right = [], []
            for m, s in zip(c0, c1):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
        chans = [left, right]
    else:
        raise ValueError(f"reserved channel assignment {chan_code}")
    br.align()
    br.read(16)  # frame CRC-16 (not verified)
    return np.array(chans, dtype=np.int64).T


def _parse_streaminfo(data: bytes) -> tuple[dict, int]:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata (block header past EOF)")
        hdr = data[pos]
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        if pos + 4 + length > len(data):
            raise ValueError("truncated FLAC metadata (block body past EOF)")
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:  # STREAMINFO
            if length < 18:
                raise ValueError(
                    f"truncated FLAC STREAMINFO block ({length} bytes < 18)")
            v = int.from_bytes(body[10:18], "big")
            info = {
                "sample_rate": v >> 44,
                "channels": ((v >> 41) & 0x7) + 1,
                "bits": ((v >> 36) & 0x1F) + 1,
                "total_samples": v & ((1 << 36) - 1),
            }
        pos += 4 + length
        if hdr & 0x80:  # last-metadata-block flag
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    return info, pos


def flac_info(file_name: str) -> dict:
    """STREAMINFO fields: sample_rate, channels, bits, total_samples.

    Walks the metadata chain by block headers (seeking over bodies), so
    streams with large metadata (e.g. embedded artwork beyond any fixed head
    size) parse fine and truncated metadata raises a clear ValueError."""
    with open(file_name, "rb") as f:
        if f.read(4) != b"fLaC":
            raise ValueError(f"{file_name}: not a FLAC stream "
                             "(missing fLaC magic)")
        info = None
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                raise ValueError(f"{file_name}: truncated FLAC metadata "
                                 "(block header past EOF)")
            btype = hdr[0] & 0x7F
            length = int.from_bytes(hdr[1:4], "big")
            if btype == 0:  # STREAMINFO
                body = f.read(length)
                if len(body) < 18:
                    raise ValueError(f"{file_name}: truncated FLAC "
                                     "STREAMINFO block")
                v = int.from_bytes(body[10:18], "big")
                info = {
                    "sample_rate": v >> 44,
                    "channels": ((v >> 41) & 0x7) + 1,
                    "bits": ((v >> 36) & 0x1F) + 1,
                    "total_samples": v & ((1 << 36) - 1),
                }
            else:
                f.seek(length, 1)
            if hdr[0] & 0x80:  # last-metadata-block flag
                break
    if info is None:
        raise ValueError(f"{file_name}: FLAC stream has no STREAMINFO block")
    return info


def read_flac(file_name: str) -> tuple[np.ndarray, int]:
    """Decode a FLAC file to int16 samples (the array_from_wave contract).

    Returns ``(audio, sample_rate)``; audio is ``(n,)`` for mono else
    ``(n, channels)``. Sample widths other than 16 bits are rescaled by a
    shift (24-bit >> 8, 8-bit << 8, ...), matching how utils/wave.py treats
    32-bit wavs.
    """
    with open(file_name, "rb") as f:
        data = f.read()
    info, pos = _parse_streaminfo(data)
    br = _Bits(data)
    br.pos = pos * 8
    total = info["total_samples"]
    blocks = []
    got = 0
    while (total == 0 or got < total) and br.pos < 8 * len(data):
        frame = _decode_frame(br, info)
        blocks.append(frame)
        got += frame.shape[0]
    audio = (np.concatenate(blocks, axis=0) if blocks
             else np.zeros((0, info["channels"]), np.int64))
    if total and audio.shape[0] > total:  # final frame may be padded
        audio = audio[:total]
    bits = info["bits"]
    if bits > 16:
        audio = audio >> (bits - 16)
    elif bits < 16:
        audio = audio << (16 - bits)
    audio = audio.astype(np.int16)
    if info["channels"] == 1:
        audio = audio[:, 0]
    return audio, info["sample_rate"]
