"""Shorten (SHN) v1/v2 lossless audio decoder, pure Python.

WSJ distributes its speech as SPHERE files whose payload is
"embedded-shorten-v2"-compressed PCM; the reference (and the recipe here,
until now) shells out to sph2pipe to expand them once up front (reference
examples/wsj/preprocess.sh:27-33; SURVEY §2.1 #17). This decoder removes
that external dependency: ``utils.wave.array_from_wave`` can read a
shorten-compressed SPHERE file in place, completing the "read every corpus
in place" story alongside the native FLAC (LibriSpeech) and NIST/mu-law
(TIMIT) readers.

Format (Tony Robinson's shorten, as embedded by NIST/LDC):

  * 4-byte magic ``ajkg`` + 1 version byte (0..2; WSJ uses 2).
  * The rest is an MSB-first bitstream of Rice-style codes:
      - ``uvar(k)``: unary count of 0-bits terminated by a 1-bit, then k
        literal bits: value = count << k | literal.
      - ``var(k)`` = zigzag-signed ``uvar(k+1)`` (LSB is the sign).
      - ``ulong`` = ``uvar(uvar(2))``.
  * Header fields (all ulong): file type, channel count, and for version
    >= 1: block size, max LPC order, mean-window length ``nmean``, and a
    skipped-bytes count (each skipped byte coded as uvar(7)).
  * Then a command stream (uvar(2)): DIFF0..3 / ZERO / QLPC decode one
    channel block (fixed polynomial predictors of order 0..3, a zero
    block, or quantized LPC), BLOCKSIZE / BITSHIFT update decoder state,
    VERBATIM carries original-file header bytes (discarded here, like
    sph2pipe), QUIT ends the stream.
  * DIFF0 and QLPC add a running mean offset ``coffset`` derived from the
    last ``nmean`` block means (version-2 streams store the means
    left-shifted by the current bitshift and round the offset back down).
  * Each channel keeps 3 warmup samples wrapped from its previous block,
    in the PRE-bitshift domain; decoded blocks are left-shifted by
    ``bitshift`` on output.

Conformance caveat (same as the FLAC pair in this repo): no external SHN
encoder exists on this machine, so the format is pinned by (a) hand-written
bit-level vectors in tests/shorten_test.py written directly from the spec
above and (b) round-trips against the independent test-only encoder in
tests/shn_ref_encoder.py. If a real sph2pipe/shorten fixture becomes
available, add it to the tests.
"""

from __future__ import annotations

import bisect

import numpy as np

MAGIC = b"ajkg"
MAX_VERSION = 2

# command codes (shorten.h)
FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3 = 0, 1, 2, 3
FN_QUIT, FN_BLOCKSIZE, FN_BITSHIFT, FN_QLPC, FN_ZERO, FN_VERBATIM = \
    4, 5, 6, 7, 8, 9

# code-size constants (shorten.h)
FNSIZE = 2
ENERGYSIZE = 3
BITSHIFTSIZE = 2
LPCQSIZE = 2
LPCQUANT = 5
XBYTESIZE = 7
ULONGSIZE = 2
VERBATIM_CKSIZE_SIZE = 5
VERBATIM_BYTE_SIZE = 8
NWRAP = 3

# file types (shorten.h); sample-to-int16 conversion per type below
TYPE_AU1, TYPE_S8, TYPE_U8, TYPE_S16HL, TYPE_U16HL, TYPE_S16LH, \
    TYPE_U16LH, TYPE_ULAW, TYPE_AU2, TYPE_AU3, TYPE_ALAW = range(11)

_SIGNED_16 = (TYPE_S16HL, TYPE_S16LH)
_UNSIGNED_16 = (TYPE_U16HL, TYPE_U16LH)


class _BitReader:
    """MSB-first bit reader (shorten buffers 32-bit big-endian words and
    consumes bits from the MSB, which is byte-wise MSB-first).

    ``var_block`` decodes a whole run of identically-sized ``var`` codes at
    once using a precomputed table of set-bit positions — the residual
    blocks are ~all of a stream's bits, and decoding them one Python bit at
    a time made in-place WSJ reads ~10x slower than necessary."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self._ones: list[int] | None = None  # positions of 1-bits

    def bit(self) -> int:
        p = self.pos
        if p >= 8 * len(self.data):
            raise ValueError("truncated shorten stream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def uvar(self, k: int) -> int:
        count = 0
        while not self.bit():
            count += 1
            if count > 1 << 20:
                raise ValueError("malformed shorten stream (runaway unary)")
        return (count << k) | self.bits(k) if k else count

    def var(self, k: int) -> int:
        u = self.uvar(k + 1)
        return -(u >> 1) - 1 if (u & 1) else (u >> 1)

    def ulong(self) -> int:
        return self.uvar(self.uvar(ULONGSIZE))

    def _index_ones(self) -> None:
        import array

        bits = np.unpackbits(np.frombuffer(self.data, np.uint8))
        self._bits = bits
        # array('q'): bisect gets C-speed comparisons without boxing every
        # position as a Python int (a list would cost ~30x the file size)
        self._ones = array.array("q", np.flatnonzero(bits).tobytes())

    def var_block(self, k: int, n: int) -> np.ndarray:
        """Decode ``n`` consecutive ``var(k)`` codes as an int64 array
        (bit-exact with calling :meth:`var` ``n`` times)."""
        if n == 0:
            return np.zeros(0, np.int64)
        if self._ones is None:
            self._index_ones()
        ones = self._ones
        n_ones = len(ones)
        k1 = k + 1
        total_bits = 8 * len(self.data)
        entry = self.pos
        stops = []
        append = stops.append
        bl = bisect.bisect_left
        # j = index in `ones` of the first 1-bit at or after the entry pos
        j = bl(ones, entry)
        pos = entry
        for _ in range(n):
            if j >= n_ones:
                raise ValueError("truncated shorten stream")
            s = ones[j]
            append(s)
            pos = s + 1 + k1
            # skip 1-bits inside the k1 literal bits we just consumed (the
            # lo hint makes this a near-constant-size search)
            j = bl(ones, pos, j + 1)
        if pos > total_bits:
            raise ValueError("truncated shorten stream")
        self.pos = pos

        stops_a = np.asarray(stops, np.int64)
        starts = np.empty(n, np.int64)
        starts[0] = entry
        starts[1:] = stops_a[:-1] + 1 + k1
        counts = stops_a - starts  # unary zero runs
        if int(counts.max()) > 1 << 20:
            # same runaway-unary cap as the scalar uvar path and the native
            # decoder, so all decode paths accept/reject the same streams
            # (and counts << k1 can never overflow int64)
            raise ValueError("malformed shorten stream (runaway unary)")
        # gather the k1 literal bits after each stop bit
        idx = stops_a[:, None] + 1 + np.arange(k1)[None, :]
        low = self._bits[idx].astype(np.int64)
        weights = 1 << np.arange(k1 - 1, -1, -1, dtype=np.int64)
        u = (counts << k1) | (low @ weights)
        return np.where(u & 1, -(u >> 1) - 1, u >> 1)


def _rounded_shift_down(x: int, n: int) -> int:
    if n == 0:
        return x
    return ((x >> (n - 1)) + 1) >> 1


def _cdiv(a: int, b: int) -> int:
    """C signed integer division (truncates toward zero; Python // floors —
    they differ for negative numerators, and shorten's mean/offset math is
    specified by the C behavior)."""
    q = abs(a) // b
    return -q if a < 0 else q


def lpcq_offset(version: int) -> int:
    """QLPC prediction initializer: version >= 2 adds 1 << LPCQUANT
    (shorten.c's version-gated V2LPCQOFFSET), earlier versions add nothing."""
    return (1 << LPCQUANT) if version >= 2 else 0


def _ulaw_to_int16(u: np.ndarray) -> np.ndarray:
    from speech_tpu.utils.wave import _ulaw_decode

    return _ulaw_decode(u.astype(np.uint8))


def _alaw_to_int16(a: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> linear int16."""
    a = a.astype(np.int32) ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    sample = (mantissa << 4) + 8
    sample = np.where(exponent > 0, (sample + 0x100) << (exponent - 1), sample)
    return np.where(sign != 0, -sample, sample).astype(np.int16)


def decode_shorten(data: bytes, max_samples: int | None = None
                   ) -> tuple[np.ndarray, dict]:
    """Decode a shorten stream to int16 samples.

    Returns ``(audio, info)``: audio is ``(n,)`` mono or ``(n, nchan)``;
    info carries ``ftype``, ``nchan``, ``blocksize``, ``nmean``.

    ``max_samples``: optional per-channel output bound. A container that
    knows the true length (SPHERE's sample_count) should pass it so a
    hostile tiny stream of huge-blocksize ZERO commands cannot expand to
    gigabytes before the count is checked (decompression bomb).
    """
    if data[:4] != MAGIC:
        raise ValueError("not a shorten stream (missing ajkg magic)")
    if len(data) < 5:
        raise ValueError("truncated shorten stream (no version byte)")
    version = data[4]
    if not 1 <= version <= MAX_VERSION:
        # version-0 streams used an off-by-one energy-parameter convention;
        # nothing NIST/LDC ships is v0, so reject rather than half-support.
        raise ValueError(f"unsupported shorten version {version}")
    br = _BitReader(data)
    br.pos = 5 * 8

    def checked_blocksize(v: int) -> int:
        if not 1 <= v <= 1 << 20:
            raise ValueError(f"implausible shorten block size {v}")
        return v

    def checked_resn(v: int) -> int:
        # samples are <= 32-bit; a larger Rice parameter only appears in
        # corrupt/hostile streams and would size the literal-bit gather
        # (and allocations) by it
        if v > 32:
            raise ValueError(f"implausible shorten residual size {v}")
        return v

    ftype = br.ulong()
    nchan = br.ulong()
    if not 1 <= nchan <= 8:
        raise ValueError(f"implausible shorten channel count {nchan}")
    blocksize = checked_blocksize(br.ulong())
    maxnlpc = br.ulong()
    nmean = br.ulong()
    nskip = br.ulong()
    # bounds mirror the native decoder (sphere_core.h) exactly so the two
    # paths accept/reject the same streams; hostile values would otherwise
    # size the warmup/offset allocations
    if maxnlpc > 1024:
        raise ValueError(f"implausible shorten max LPC order {maxnlpc}")
    if nmean > 65536:
        raise ValueError(f"implausible shorten mean window {nmean}")
    if nskip > len(data):
        raise ValueError(f"implausible shorten skip count {nskip}")
    for _ in range(nskip):
        br.uvar(XBYTESIZE)
    nwrap = max(NWRAP, maxnlpc)

    # Per-channel state: warmup samples (pre-bitshift domain) and the last
    # nmean block means (stored << bitshift for version >= 2). Unsigned
    # types start centred at the half-range (shorten.c init_offset), so the
    # first DIFF0/QLPC blocks predict around the midpoint.
    mean0 = 0x80 if ftype == TYPE_U8 else (
        0x8000 if ftype in _UNSIGNED_16 else 0)
    wrap = [[0] * nwrap for _ in range(nchan)]  # warmup starts at zero
    offsets = [[mean0] * max(nmean, 1) for _ in range(nchan)]
    bitshift = 0
    chan = 0
    out = [[] for _ in range(nchan)]
    n_out = [0] * nchan

    while True:
        cmd = br.uvar(FNSIZE)
        if cmd == FN_QUIT:
            break
        if cmd == FN_BLOCKSIZE:
            blocksize = checked_blocksize(br.ulong())
            continue
        if cmd == FN_BITSHIFT:
            bitshift = br.uvar(BITSHIFTSIZE)
            if bitshift > 31:  # C shifts >= 64 are UB; samples are <= 32-bit
                raise ValueError(f"implausible shorten bitshift {bitshift}")
            continue
        if cmd == FN_VERBATIM:
            n = br.uvar(VERBATIM_CKSIZE_SIZE)
            for _ in range(n):
                br.uvar(VERBATIM_BYTE_SIZE)  # original header bytes; discard
            continue
        if cmd not in (FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3, FN_ZERO,
                       FN_QLPC):
            raise ValueError(f"malformed shorten stream (command {cmd})")

        # mean offset (duplicated-code comment in shorten.c)
        if nmean == 0:
            coffset = offsets[chan][0]
        else:
            s = 0 if version < 2 else nmean // 2
            s += sum(offsets[chan])
            coffset = (_cdiv(s, nmean) if version < 2
                       else _rounded_shift_down(_cdiv(s, nmean), bitshift))

        if cmd == FN_ZERO:
            samples = np.zeros(blocksize, np.int64)
        elif cmd in (FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3):
            resn = checked_resn(br.uvar(ENERGYSIZE))
            res = br.var_block(resn, blocksize)
            # fixed polynomial predictors, vectorized: order-p prediction
            # means the p-th difference of the samples equals the residual,
            # so each order is one more cumulative sum seeded from the
            # warmup (bit-exact with the per-sample recurrences; pinned by
            # the hand-built vectors and round-trips in tests).
            w = wrap[chan]
            if cmd == FN_DIFF0:
                samples = res + coffset
            elif cmd == FN_DIFF1:
                samples = w[-1] + np.cumsum(res)
            elif cmd == FN_DIFF2:
                d_prev = w[-1] - w[-2]
                samples = w[-1] + np.cumsum(d_prev + np.cumsum(res))
            else:  # FN_DIFF3
                d_prev = w[-1] - w[-2]
                e_prev = d_prev - (w[-2] - w[-3])
                samples = w[-1] + np.cumsum(
                    d_prev + np.cumsum(e_prev + np.cumsum(res)))
        elif cmd == FN_QLPC:
            buf = wrap[chan] + [0] * blocksize  # buf[nwrap + i] = sample i
            resn = checked_resn(br.uvar(ENERGYSIZE))
            nlpc = br.uvar(LPCQSIZE)
            if nlpc > nwrap:
                # a valid stream never predicts past its declared maxnlpc
                # warmup; wrapped negative Python indexing would silently
                # read future samples instead of failing
                raise ValueError(
                    f"malformed shorten stream (LPC order {nlpc} exceeds "
                    f"the header's max {nwrap})")
            qlpc = [br.var(LPCQUANT) for _ in range(nlpc)]
            if coffset:
                for i in range(nwrap):
                    buf[i] -= coffset
            qoff = lpcq_offset(version)
            for i in range(blocksize):
                acc = qoff
                for j in range(nlpc):
                    acc += qlpc[j] * buf[nwrap + i - j - 1]
                buf[nwrap + i] = br.var(resn) + (acc >> LPCQUANT)
            if coffset:
                for i in range(blocksize):
                    buf[nwrap + i] += coffset
            samples = np.asarray(buf[nwrap:], np.int64)

        # store the block mean (pre-bitshift domain, shifted on store in v2)
        if nmean > 0:
            s = (0 if version < 2 else blocksize // 2) + int(samples.sum())
            offsets[chan] = offsets[chan][1:] + [
                _cdiv(s, blocksize) if version < 2
                else _cdiv(s, blocksize) << bitshift]
        # wrap warmup samples in the PRE-bitshift domain. shorten.c wraps
        # its in-place buffer, so when a QLPC block is shorter than the
        # warmup the reached-back entries KEEP the coffset subtraction —
        # match that quirk exactly (sphere_core.h mirrors it).
        if cmd == FN_QLPC:
            wrap[chan] = [int(v) for v in buf[-nwrap:]]
        else:
            wrap[chan] = [int(v) for v in
                          (wrap[chan] + samples.tolist())[-nwrap:]]
        out[chan].append(samples << bitshift if bitshift else samples)
        n_out[chan] += blocksize
        if max_samples is not None and n_out[chan] > max_samples:
            raise ValueError(
                f"shorten stream exceeds the expected {max_samples} "
                "samples per channel (corrupt stream or wrong container "
                "sample_count)")
        chan = (chan + 1) % nchan

    out = [np.concatenate(c) if c else np.zeros(0, np.int64) for c in out]
    n = min(len(c) for c in out) if nchan > 1 else len(out[0])
    arr = np.stack([c[:n] for c in out], axis=1)

    if ftype in _SIGNED_16 or ftype in (TYPE_AU2, TYPE_AU3):
        audio = arr.astype(np.int16)
    elif ftype in _UNSIGNED_16:
        audio = (arr - 0x8000).astype(np.int16)
    elif ftype == TYPE_S8:
        audio = (arr.astype(np.int16)) << 8
    elif ftype == TYPE_U8:
        audio = ((arr - 0x80).astype(np.int16)) << 8
    elif ftype in (TYPE_ULAW, TYPE_AU1):
        audio = _ulaw_to_int16(arr.astype(np.int64) & 0xFF)
    elif ftype == TYPE_ALAW:
        audio = _alaw_to_int16(arr.astype(np.int64) & 0xFF)
    else:
        raise ValueError(f"unsupported shorten file type {ftype}")
    if nchan == 1:
        audio = audio[:, 0]
    info = {"ftype": ftype, "nchan": nchan, "blocksize": blocksize,
            "nmean": nmean, "version": version}
    return audio, info
