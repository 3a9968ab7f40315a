"""Minimal FLAC *encoder* used only by tests.

Produces spec-conformant FLAC streams exercising every decoder path:
CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, Rice partitions (both
4- and 5-bit params) with escape codes, wasted bits via shifted input,
independent and left/side / right/side / mid/side stereo, and arbitrary
block sizes. Header CRC-8 and frame CRC-16 are computed properly so the
output is valid for any FLAC decoder, not just ours.

This is NOT part of the framework (the framework only decodes); it exists so
tests/flac_test.py can round-trip known PCM through both the Python decoder
(speech_tpu.utils.flac) and the native one (speech_tpu/native/flacdec.cc).
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    for n_cont in range(1, 7):
        free = 6 - n_cont  # payload bits in the lead byte
        if n < 1 << (free + 6 * n_cont):
            lead = (0xFF << (7 - n_cont)) & 0xFF | (n >> (6 * n_cont))
            out.append(lead)
            for i in range(n_cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("number too large for FLAC UTF-8 coding")


def _best_rice_param(resid: list[int], plen: int) -> int:
    best, best_bits = 0, None
    for p in range((1 << plen) - 1):
        bits = sum((((v << 1) ^ (v >> 63)) >> p) + 1 + p for v in
                   (int(r) for r in resid))
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def _write_residual(bw: _BitWriter, resid: list[int], blocksize: int,
                    order: int, porder: int = 0, plen: int = 4,
                    escape_raw_bits: int | None = None) -> None:
    # Clamp the partition order for short (final) frames: the block must
    # split evenly and the first partition must keep >= 0 samples.
    while porder and (blocksize % (1 << porder)
                      or (blocksize >> porder) < order):
        porder -= 1
    bw.write(0 if plen == 4 else 1, 2)
    bw.write(porder, 4)
    nparts = 1 << porder
    per = blocksize >> porder
    escape = (1 << plen) - 1
    idx = 0
    for p in range(nparts):
        cnt = per - (order if p == 0 else 0)
        part = resid[idx:idx + cnt]
        idx += cnt
        if escape_raw_bits is not None:
            bw.write(escape, plen)
            bw.write(escape_raw_bits, 5)
            for v in part:
                bw.write(int(v), escape_raw_bits)
            continue
        param = _best_rice_param(part, plen)
        bw.write(param, plen)
        for v in part:
            v = int(v)
            u = (v << 1) ^ (v >> 63)
            bw.write_unary(u >> param)
            bw.write(u, param)


def _write_subframe(bw: _BitWriter, samples: np.ndarray, bps: int,
                    mode: str, wasted: int = 0, porder: int = 0,
                    plen: int = 4, escape_raw_bits: int | None = None) -> None:
    s = [int(v) for v in samples]
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in s), \
            "wasted-bits mode needs samples divisible by 2**wasted"
        s = [v >> wasted for v in s]
    bps_eff = bps - wasted
    bw.write(0, 1)  # padding

    def _type_and_wasted(code: int) -> None:
        bw.write(code, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if mode == "constant":
        assert all(v == s[0] for v in s)
        _type_and_wasted(0)
        bw.write(s[0], bps_eff)
    elif mode == "verbatim":
        _type_and_wasted(1)
        for v in s:
            bw.write(v, bps_eff)
    elif mode.startswith("fixed"):
        order = int(mode[5:])
        coefs = _FIXED_COEFS[order]
        _type_and_wasted(8 + order)
        for v in s[:order]:
            bw.write(v, bps_eff)
        resid = [s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
                 for i in range(order, len(s))]
        _write_residual(bw, resid, len(s), order, porder, plen,
                        escape_raw_bits)
    elif mode.startswith("lpc"):
        order = int(mode[3:])
        # A mild low-pass-ish quantized predictor; any coefficients are
        # valid — the encoder just has to emit matching residuals.
        prec, shift = 12, 10
        coefs = [((1 << shift) * (order - j) // (order * (j + 2)))
                 for j in range(order)]
        _type_and_wasted(32 + order - 1)
        for v in s[:order]:
            bw.write(v, bps_eff)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, prec)
        resid = [s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
                         >> shift)
                 for i in range(order, len(s))]
        _write_residual(bw, resid, len(s), order, porder, plen,
                        escape_raw_bits)
    else:
        raise ValueError(mode)


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16,
                blocksize: int = 256, mode: str = "fixed2",
                stereo: str = "independent", wasted: int = 0,
                porder: int = 0, plen: int = 4,
                escape_raw_bits: int | None = None) -> bytes:
    """Encode PCM into a FLAC stream. samples: (n,) or (n, channels) ints."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    assert nch in (1, 2)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += blocksize.to_bytes(2, "big") * 2          # min/max blocksize
    si += (0).to_bytes(3, "big") * 2                # min/max framesize unknown
    v = (sample_rate << 44) | ((nch - 1) << 41) | ((bits - 1) << 36) | n
    si += v.to_bytes(8, "big")
    si += bytes(16)                                  # md5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    ss_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}
    frame_no = 0
    for start in range(0, n, blocksize):
        block = samples[start:start + blocksize]
        bs = block.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)          # reserved
        bw.write(0, 1)          # fixed blocking
        bw.write(7, 4)          # blocksize: 16-bit at end of header
        bw.write(0, 4)          # sample rate: from STREAMINFO
        if nch == 1 or stereo == "independent":
            bw.write(nch - 1, 4)
        else:
            bw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo],
                     4)
        bw.write(ss_codes.get(bits, 0), 3)
        bw.write(0, 1)          # reserved
        for b in _utf8_num(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)

        kw = dict(porder=porder, plen=plen, escape_raw_bits=escape_raw_bits)
        if nch == 1 or stereo == "independent":
            for c in range(nch):
                _write_subframe(bw2, block[:, c], bits, mode, wasted, **kw)
        else:
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            if stereo == "left_side":
                _write_subframe(bw2, left, bits, mode, wasted, **kw)
                _write_subframe(bw2, side, bits + 1, mode, 0, **kw)
            elif stereo == "right_side":
                _write_subframe(bw2, side, bits + 1, mode, 0, **kw)
                _write_subframe(bw2, right, bits, mode, wasted, **kw)
            else:  # mid_side
                mid = (left + right) >> 1
                _write_subframe(bw2, mid, bits, mode, wasted, **kw)
                _write_subframe(bw2, side, bits + 1, mode, 0, **kw)
        bw2.align()
        frame = bw2.bytes()
        bw3 = _BitWriter()
        for b in frame:
            bw3.write(b, 8)
        bw3.write(_crc16(frame), 16)
        out += bw3.bytes()
        frame_no += 1
    return bytes(out)
