"""Test-only Shorten (SHN) v2 encoder — adversarial fixture generator for
speech_tpu.utils.shorten (the decoder that lets WSJ's embedded-shorten
SPHERE files be read in place).

Mirrors the format documented in the decoder's module docstring,
implemented independently: MSB-first bitstream, uvar/var/ulong codes,
DIFF0-3 / ZERO / QLPC predictors with warmup wrap, the version-2 mean
offset (means stored << bitshift, offset rounded back down), BITSHIFT /
BLOCKSIZE / VERBATIM commands. Like tests/flac_ref_encoder.py this exists
purely so the decoder can be round-trip tested on this machine (no shorten
or sph2pipe binary exists here); bit-level hand vectors in shorten_test.py
pin the code conventions independently of this file.
"""

from __future__ import annotations

import numpy as np

from speech_tpu.utils.shorten import (BITSHIFTSIZE, ENERGYSIZE, FN_BITSHIFT,
                                      FN_BLOCKSIZE, FN_DIFF0, FN_DIFF1,
                                      FN_DIFF2, FN_DIFF3, FN_QLPC, FN_QUIT,
                                      FN_VERBATIM, FN_ZERO, FNSIZE, LPCQSIZE,
                                      LPCQUANT, MAGIC, NWRAP, ULONGSIZE,
                                      VERBATIM_BYTE_SIZE,
                                      VERBATIM_CKSIZE_SIZE, XBYTESIZE, _cdiv,
                                      _rounded_shift_down, lpcq_offset)


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def bit(self, b: int):
        self.bits.append(b & 1)

    def put_bits(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def uvar(self, v: int, k: int):
        count = v >> k
        self.bits.extend([0] * count)
        self.bit(1)
        if k:
            self.put_bits(v & ((1 << k) - 1), k)

    def var(self, v: int, k: int):
        u = (-v - 1) * 2 + 1 if v < 0 else v * 2
        self.uvar(u, k + 1)

    def ulong(self, v: int):
        nbit = max(v.bit_length(), 0)
        self.uvar(nbit, ULONGSIZE)
        self.uvar(v, nbit)

    def tobytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def _residual_k(res: list[int]) -> int:
    """Pick a Rice parameter that keeps unary parts short."""
    m = max((abs(r) for r in res), default=0)
    k = 0
    while (m >> k) > 3 and k < 16:
        k += 1
    return k + 1  # +1: var() codes through uvar(k+1)


def encode_shn(samples: np.ndarray, ftype: int = 3, version: int = 2,
               blocksize: int = 64, nmean: int = 4, maxnlpc: int = 0,
               commands: str = "auto", bitshift_at: int = -1,
               bitshift: int = 0, verbatim: bytes = b"",
               nskip_bytes: bytes = b"") -> bytes:
    """Encode int samples (n,) or (n, nchan) to a shorten v1/v2 stream.

    ``commands``: "auto" picks the cheapest DIFF order per block;
    "diff0".."diff3", "zero" (only valid for all-zero blocks), or "qlpc"
    force one command for every block.
    """
    arr = np.asarray(samples, np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nchan = arr.shape
    if commands == "qlpc" and maxnlpc < 2:
        maxnlpc = 2  # the demo QLPC predictor below is order 2
    nwrap = max(NWRAP, maxnlpc)

    w = BitWriter()
    w.ulong(ftype)
    w.ulong(nchan)
    if version > 0:
        w.ulong(blocksize)
        w.ulong(maxnlpc)
        w.ulong(nmean)
        w.ulong(len(nskip_bytes))
        for b in nskip_bytes:
            w.uvar(b, XBYTESIZE)

    if verbatim:
        w.uvar(FN_VERBATIM, FNSIZE)
        w.uvar(len(verbatim), VERBATIM_CKSIZE_SIZE)
        for b in verbatim:
            w.uvar(b, VERBATIM_BYTE_SIZE)

    mean0 = 0x80 if ftype == 2 else (0x8000 if ftype in (4, 6) else 0)
    wrap = [[0] * nwrap for _ in range(nchan)]
    offsets = [[mean0] * max(nmean, 1) for _ in range(nchan)]
    cur_shift = 0
    pos = [0] * nchan
    chan = 0
    block_index = 0

    while pos[chan] < n:
        if block_index == bitshift_at and chan == 0:
            w.uvar(FN_BITSHIFT, FNSIZE)
            w.uvar(bitshift, BITSHIFTSIZE)
            cur_shift = bitshift
        this = min(blocksize, n - pos[chan])
        if this != blocksize and chan == 0:
            w.uvar(FN_BLOCKSIZE, FNSIZE)
            w.ulong(this)
            blocksize = this
        # pre-shift domain samples for this channel block
        block = [int(v) >> cur_shift for v in
                 arr[pos[chan]:pos[chan] + this, chan]]

        if nmean == 0:
            coffset = offsets[chan][0]
        else:
            s = (0 if version < 2 else nmean // 2) + sum(offsets[chan])
            coffset = (_cdiv(s, nmean) if version < 2
                       else _rounded_shift_down(_cdiv(s, nmean), cur_shift))

        wb = wrap[chan] + block
        cands = {}
        cands[FN_DIFF0] = [wb[nwrap + i] - coffset for i in range(this)]
        cands[FN_DIFF1] = [wb[nwrap + i] - wb[nwrap + i - 1]
                           for i in range(this)]
        cands[FN_DIFF2] = [wb[nwrap + i] - 2 * wb[nwrap + i - 1]
                           + wb[nwrap + i - 2] for i in range(this)]
        cands[FN_DIFF3] = [wb[nwrap + i] - 3 * wb[nwrap + i - 1]
                           + 3 * wb[nwrap + i - 2] - wb[nwrap + i - 3]
                           for i in range(this)]

        if commands == "auto":
            if all(v == 0 for v in block):
                cmd = FN_ZERO
            else:
                cmd = min(cands, key=lambda c: sum(abs(r) for r in cands[c]))
        elif commands == "zero":
            assert all(v == 0 for v in block)
            cmd = FN_ZERO
        elif commands == "qlpc":
            cmd = FN_QLPC
        else:
            cmd = {"diff0": FN_DIFF0, "diff1": FN_DIFF1, "diff2": FN_DIFF2,
                   "diff3": FN_DIFF3}[commands]

        w.uvar(cmd, FNSIZE)
        if cmd == FN_QLPC:
            # fixed demo predictor: order 2, coeffs ~ [2, -1] << LPCQUANT
            qlpc = [2 << LPCQUANT, -(1 << LPCQUANT)]
            res = []
            wb_off = [v - coffset for v in wrap[chan]] + \
                [v - coffset for v in block]
            qoff = lpcq_offset(version)
            for i in range(this):
                acc = qoff
                for j, q in enumerate(qlpc):
                    acc += q * wb_off[nwrap + i - j - 1]
                res.append(wb_off[nwrap + i] - (acc >> LPCQUANT))
            k = _residual_k(res)
            w.uvar(k, ENERGYSIZE)
            w.uvar(len(qlpc), LPCQSIZE)
            for q in qlpc:
                w.var(q, LPCQUANT)
            for r in res:
                w.var(r, k)
        elif cmd != FN_ZERO:
            res = cands[cmd]
            k = _residual_k(res)
            w.uvar(k, ENERGYSIZE)
            for r in res:
                w.var(r, k)

        if nmean > 0:
            s = (0 if version < 2 else this // 2) + sum(block)
            offsets[chan] = offsets[chan][1:] + [
                _cdiv(s, this) if version < 2
                else _cdiv(s, this) << cur_shift]
        if cmd == FN_QLPC and coffset:
            # shorten.c wraps its in-place buffer, whose warmup entries keep
            # the coffset subtraction after a QLPC block — model the decoder
            wrap[chan] = ([v - coffset for v in wrap[chan]]
                          + block)[-nwrap:]
        else:
            wrap[chan] = wb[this:this + nwrap]
        pos[chan] += this
        chan = (chan + 1) % nchan
        if chan == 0:
            block_index += 1

    w.uvar(FN_QUIT, FNSIZE)
    return MAGIC + bytes([version]) + w.tobytes()
