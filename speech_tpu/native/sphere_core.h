// NIST SPHERE container + Shorten (SHN) v1/v2 payload decoding, header-only.
//
// Native counterpart of speech_tpu/utils/wave.py::_read_sphere and
// speech_tpu/utils/shorten.py (parity-tested against them in
// tests/native_featurizer_test.py / tests/shorten_test.py): lets the
// GIL-free featurizer thread pool (featurizer.cc) read TIMIT (PCM/mu-law
// SPHERE) and WSJ (embedded-shorten-v2 SPHERE .wv1) corpora in place, the
// way flac_core.h covers LibriSpeech. The shorten bitstream format is
// documented in utils/shorten.py's module docstring; the semantics here
// mirror that implementation line for line (C integer division IS the
// truncation-toward-zero the format specifies).

#ifndef SPEECH_TPU_SPHERE_CORE_H_
#define SPEECH_TPU_SPHERE_CORE_H_

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace sphere_core {

enum {
  OK = 0,
  ERR_OPEN = -1,
  ERR_NOT_SPHERE = -2,
  ERR_TRUNCATED = -3,
  ERR_MALFORMED = -4,
  ERR_UNSUPPORTED = -5,
};

// ---------------------------------------------------------------------------
// Shorten bitstream
// ---------------------------------------------------------------------------

namespace shn {

constexpr int FN_DIFF0 = 0, FN_DIFF1 = 1, FN_DIFF2 = 2, FN_DIFF3 = 3,
              FN_QUIT = 4, FN_BLOCKSIZE = 5, FN_BITSHIFT = 6, FN_QLPC = 7,
              FN_ZERO = 8, FN_VERBATIM = 9;
constexpr int FNSIZE = 2, ENERGYSIZE = 3, BITSHIFTSIZE = 2, LPCQSIZE = 2,
              LPCQUANT = 5, XBYTESIZE = 7, ULONGSIZE = 2,
              VERBATIM_CKSIZE_SIZE = 5, VERBATIM_BYTE_SIZE = 8, NWRAP = 3;
constexpr int TYPE_AU1 = 0, TYPE_S8 = 1, TYPE_U8 = 2, TYPE_S16HL = 3,
              TYPE_U16HL = 4, TYPE_S16LH = 5, TYPE_U16LH = 6, TYPE_ULAW = 7,
              TYPE_AU2 = 8, TYPE_AU3 = 9, TYPE_ALAW = 10;

struct BitReader {
  const uint8_t* data;
  int64_t size;     // bytes
  int64_t pos = 0;  // bit position
  bool overrun = false;

  int bit() {
    if (pos >= 8 * size) {
      overrun = true;
      return 1;  // terminate unary scans; caller checks overrun
    }
    const int b = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
    pos++;
    return b;
  }
  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | (uint64_t)bit();
    return v;
  }
  uint64_t uvar(int k) {
    uint64_t count = 0;
    while (!bit()) {
      if (++count > (1u << 20)) {
        overrun = true;
        return 0;
      }
    }
    return (count << k) | bits(k);
  }
  int64_t svar(int k) {
    const uint64_t u = uvar(k + 1);
    return (u & 1) ? -(int64_t)(u >> 1) - 1 : (int64_t)(u >> 1);
  }
  uint64_t ulong_() { return uvar((int)uvar(ULONGSIZE)); }
};

inline int64_t rounded_shift_down(int64_t x, int n) {
  if (n == 0) return x;
  return ((x >> (n - 1)) + 1) >> 1;
}

inline int16_t ulaw_to_int16(uint8_t byte) {
  const int u = (~(int)byte) & 0xFF;
  const int sign = u & 0x80;
  const int exponent = (u >> 4) & 0x07;
  const int mantissa = u & 0x0F;
  int sample = (((mantissa << 3) + 0x84) << exponent) - 0x84;
  return (int16_t)(sign ? -sample : sample);
}

inline int16_t alaw_to_int16(uint8_t byte) {
  const int a = ((int)byte) ^ 0x55;
  const int sign = a & 0x80;
  const int exponent = (a >> 4) & 0x07;
  const int mantissa = a & 0x0F;
  int sample = (mantissa << 4) + 8;
  if (exponent > 0) sample = (sample + 0x100) << (exponent - 1);
  return (int16_t)(sign ? -sample : sample);
}

// Decode a shorten stream into interleaved int16. Returns samples per
// channel, or a negative error. *nchan_out receives the channel count.
// max_samples (< 0 = unbounded) caps the per-channel output so a tiny
// hostile stream of huge-blocksize commands cannot expand to gigabytes
// before a container-level count check (decompression bomb).
inline int64_t decode(const uint8_t* data, int64_t size,
                      std::vector<int16_t>* out, int* nchan_out,
                      int64_t max_samples = -1) {
  if (size < 5 || memcmp(data, "ajkg", 4) != 0) return ERR_MALFORMED;
  const int version = data[4];
  if (version < 1 || version > 2) return ERR_UNSUPPORTED;
  BitReader br{data, size};
  br.pos = 5 * 8;

  const int64_t ftype = (int64_t)br.ulong_();
  const int64_t nchan = (int64_t)br.ulong_();
  if (br.overrun || nchan < 1 || nchan > 8) return ERR_MALFORMED;
  int64_t blocksize = (int64_t)br.ulong_();
  const int64_t maxnlpc = (int64_t)br.ulong_();
  const int64_t nmean = (int64_t)br.ulong_();
  const int64_t nskip = (int64_t)br.ulong_();
  if (br.overrun || blocksize < 1 || blocksize > (1 << 20) ||
      maxnlpc > 1024 || nmean > 65536 || nskip > (int64_t)size)
    return ERR_MALFORMED;
  for (int64_t i = 0; i < nskip; i++) br.uvar(XBYTESIZE);
  const int64_t nwrap = NWRAP > maxnlpc ? NWRAP : maxnlpc;

  const int64_t mean0 =
      (ftype == TYPE_U8) ? 0x80
      : (ftype == TYPE_U16HL || ftype == TYPE_U16LH) ? 0x8000 : 0;
  std::vector<std::vector<int64_t>> wrap(
      (size_t)nchan, std::vector<int64_t>((size_t)nwrap, 0));
  std::vector<std::vector<int64_t>> offsets(
      (size_t)nchan,
      std::vector<int64_t>((size_t)(nmean > 0 ? nmean : 1), mean0));
  std::vector<std::vector<int64_t>> chans((size_t)nchan);
  int bitshift = 0;
  int64_t chan = 0;
  std::vector<int64_t> block;
  std::vector<int64_t> qlpc;

  for (;;) {
    const int cmd = (int)br.uvar(FNSIZE);
    if (br.overrun) return ERR_TRUNCATED;
    if (cmd == FN_QUIT) break;
    if (cmd == FN_BLOCKSIZE) {
      blocksize = (int64_t)br.ulong_();
      if (br.overrun || blocksize < 1 || blocksize > (1 << 20))
        return ERR_MALFORMED;
      continue;
    }
    if (cmd == FN_BITSHIFT) {
      bitshift = (int)br.uvar(BITSHIFTSIZE);
      // shifts >= 64 are UB in C++; samples are <= 32-bit
      if (br.overrun || bitshift > 31) return ERR_MALFORMED;
      continue;
    }
    if (cmd == FN_VERBATIM) {
      const int64_t nv = (int64_t)br.uvar(VERBATIM_CKSIZE_SIZE);
      for (int64_t i = 0; i < nv; i++) br.uvar(VERBATIM_BYTE_SIZE);
      if (br.overrun) return ERR_TRUNCATED;
      continue;
    }
    if (cmd != FN_DIFF0 && cmd != FN_DIFF1 && cmd != FN_DIFF2 &&
        cmd != FN_DIFF3 && cmd != FN_ZERO && cmd != FN_QLPC)
      return ERR_MALFORMED;

    // mean offset
    int64_t coffset;
    auto& off = offsets[(size_t)chan];
    if (nmean == 0) {
      coffset = off[0];
    } else {
      int64_t s = (version < 2) ? 0 : nmean / 2;
      for (int64_t v : off) s += v;
      coffset = (version < 2) ? s / nmean
                              : rounded_shift_down(s / nmean, bitshift);
    }

    auto& w = wrap[(size_t)chan];
    block.assign((size_t)blocksize, 0);
    auto prev = [&](int64_t i, int64_t back) -> int64_t {
      // sample (i - back) of this block, reaching into the warmup
      return (i - back >= 0) ? block[(size_t)(i - back)]
                             : w[(size_t)(nwrap + (i - back))];
    };

    if (cmd == FN_ZERO) {
      // zeros already
    } else if (cmd == FN_QLPC) {
      const int resn = (int)br.uvar(ENERGYSIZE);
      const int64_t nlpc = (int64_t)br.uvar(LPCQSIZE);
      if (br.overrun || resn > 32 || nlpc > nwrap) return ERR_MALFORMED;
      qlpc.assign((size_t)nlpc, 0);
      for (int64_t j = 0; j < nlpc; j++) qlpc[(size_t)j] = br.svar(LPCQUANT);
      std::vector<int64_t> w_off = w;
      if (coffset)
        for (auto& v : w_off) v -= coffset;
      const int64_t qoff = (version >= 2) ? ((int64_t)1 << LPCQUANT) : 0;
      auto prev_off = [&](int64_t i, int64_t back) -> int64_t {
        return (i - back >= 0) ? block[(size_t)(i - back)]
                               : w_off[(size_t)(nwrap + (i - back))];
      };
      for (int64_t i = 0; i < blocksize; i++) {
        int64_t acc = qoff;
        for (int64_t j = 0; j < nlpc; j++)
          acc += qlpc[(size_t)j] * prev_off(i, j + 1);
        block[(size_t)i] = br.svar(resn) + (acc >> LPCQUANT);
      }
      if (coffset)
        for (auto& v : block) v += coffset;
    } else {
      const int resn = (int)br.uvar(ENERGYSIZE);
      if (br.overrun || resn > 32) return ERR_MALFORMED;
      for (int64_t i = 0; i < blocksize; i++) {
        const int64_t r = br.svar(resn);
        int64_t pred = 0;
        if (cmd == FN_DIFF0) pred = coffset;
        else if (cmd == FN_DIFF1) pred = prev(i, 1);
        else if (cmd == FN_DIFF2) pred = 2 * prev(i, 1) - prev(i, 2);
        else pred = 3 * prev(i, 1) - 3 * prev(i, 2) + prev(i, 3);
        block[(size_t)i] = r + pred;
      }
    }
    if (br.overrun) return ERR_TRUNCATED;

    if (nmean > 0) {
      int64_t s = (version < 2) ? 0 : blocksize / 2;
      for (int64_t v : block) s += v;
      for (size_t i = 1; i < off.size(); i++) off[i - 1] = off[i];
      off.back() = (version < 2) ? s / blocksize
                                 : (s / blocksize) << bitshift;
    }
    // wrap warmup samples (pre-bitshift domain). shorten.c wraps its
    // in-place buffer, so when a QLPC block is shorter than the warmup the
    // reached-back entries KEEP the coffset subtraction — match that quirk
    // (utils/shorten.py mirrors it).
    if (cmd == FN_QLPC && coffset) {
      std::vector<int64_t> w_off = w;
      for (auto& v : w_off) v -= coffset;
      for (int64_t i = 0; i < nwrap; i++) {
        const int64_t back = nwrap - i;
        w[(size_t)i] = (blocksize - back >= 0)
                           ? block[(size_t)(blocksize - back)]
                           : w_off[(size_t)(nwrap + blocksize - back)];
      }
    } else {
      for (int64_t i = 0; i < nwrap; i++)
        w[(size_t)i] = prev(blocksize, nwrap - i);
    }
    auto& sink = chans[(size_t)chan];
    if (max_samples >= 0 &&
        (int64_t)sink.size() + blocksize > max_samples)
      return ERR_MALFORMED;
    for (int64_t v : block)
      sink.push_back(bitshift ? (v << bitshift) : v);
    chan = (chan + 1) % nchan;
  }

  int64_t n = chans[0].size();
  for (auto& c : chans)
    if ((int64_t)c.size() < n) n = (int64_t)c.size();
  out->resize((size_t)(n * nchan));
  for (int64_t i = 0; i < n; i++) {
    for (int64_t k = 0; k < nchan; k++) {
      const int64_t v = chans[(size_t)k][(size_t)i];
      int16_t s16;
      if (ftype == TYPE_S16HL || ftype == TYPE_S16LH || ftype == TYPE_AU2 ||
          ftype == TYPE_AU3)
        s16 = (int16_t)v;
      else if (ftype == TYPE_U16HL || ftype == TYPE_U16LH)
        s16 = (int16_t)(v - 0x8000);
      else if (ftype == TYPE_S8)
        s16 = (int16_t)(v << 8);
      else if (ftype == TYPE_U8)
        s16 = (int16_t)((v - 0x80) << 8);
      else if (ftype == TYPE_ULAW || ftype == TYPE_AU1)
        s16 = ulaw_to_int16((uint8_t)(v & 0xFF));
      else if (ftype == TYPE_ALAW)
        s16 = alaw_to_int16((uint8_t)(v & 0xFF));
      else
        return ERR_UNSUPPORTED;
      (*out)[(size_t)(i * nchan + k)] = s16;
    }
  }
  *nchan_out = (int)nchan;
  return n;
}

}  // namespace shn

// ---------------------------------------------------------------------------
// SPHERE container
// ---------------------------------------------------------------------------

struct SphereInfo {
  int sample_rate = 16000;
  int64_t sample_count = 0;
  int channels = 1;
  int sample_n_bytes = 2;
  std::string coding = "pcm";
  std::string byte_format = "01";
  int64_t header_size = 0;
};

inline bool is_sphere(const uint8_t* head, size_t n) {
  return n >= 7 && memcmp(head, "NIST_1A", 7) == 0;
}

// Parse the ASCII header ("name -type value" lines; size on line 2).
inline int parse_header(const uint8_t* data, int64_t size, SphereInfo* info) {
  if (!is_sphere(data, (size_t)size)) return ERR_NOT_SPHERE;
  // line 2 holds the header size
  const char* p = (const char*)data;
  const char* end = p + (size < 1024 ? size : 1024);
  const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
  if (!nl) return ERR_MALFORMED;
  const char* nl2 =
      (const char*)memchr(nl + 1, '\n', (size_t)(end - (nl + 1)));
  if (!nl2) return ERR_MALFORMED;
  const std::string size_line(nl + 1, (size_t)(nl2 - nl - 1));
  const long hsize = strtol(size_line.c_str(), nullptr, 10);
  if (hsize <= 0 || hsize > size) return ERR_TRUNCATED;
  info->header_size = hsize;
  std::string header((const char*)data, (size_t)hsize);
  size_t pos = header.find('\n');
  pos = header.find('\n', pos + 1);  // skip the two magic/size lines
  while (pos != std::string::npos) {
    const size_t eol = header.find('\n', pos + 1);
    std::string line = header.substr(pos + 1, eol == std::string::npos
                                                  ? std::string::npos
                                                  : eol - pos - 1);
    if (line.rfind("end_head", 0) == 0) break;
    // whitespace-RUN tokenization ("name -type value"), matching the Python
    // reader's line.split(None, 2): doubled spaces/tabs must not shift the
    // value into the type token
    const char* ws = " \t\r";
    const size_t a = line.find_first_not_of(ws);
    const size_t b = line.find_first_of(ws, a);
    const size_t c2 = line.find_first_not_of(ws, b);
    const size_t d = line.find_first_of(ws, c2);
    const size_t e = line.find_first_not_of(ws, d);
    if (a != std::string::npos && b != std::string::npos &&
        c2 != std::string::npos && d != std::string::npos &&
        e != std::string::npos) {
      const std::string name = line.substr(a, b - a);
      std::string value = line.substr(e);
      const size_t tail = value.find_last_not_of(ws);
      if (tail != std::string::npos) value.resize(tail + 1);
      if (name == "sample_rate") info->sample_rate = atoi(value.c_str());
      else if (name == "sample_count") info->sample_count = atoll(value.c_str());
      else if (name == "channel_count") info->channels = atoi(value.c_str());
      else if (name == "sample_n_bytes") info->sample_n_bytes = atoi(value.c_str());
      else if (name == "sample_coding") info->coding = value;
      else if (name == "sample_byte_format") info->byte_format = value;
    }
    pos = eol;
  }
  if (info->channels < 1 || info->channels > 8) return ERR_MALFORMED;
  // negative/absurd counts would otherwise reach size arithmetic and
  // vector::resize (a throw across the C ABI aborts the featurizer's
  // worker threads). 2^27 samples is ~2.3 h at 16 kHz — far beyond any
  // utterance, and bounds the decode buffers a hostile header can demand.
  if (info->sample_count < 0 || info->sample_count > ((int64_t)1 << 27))
    return ERR_MALFORMED;
  if (info->sample_n_bytes < 1 || info->sample_n_bytes > 2)
    return ERR_UNSUPPORTED;
  return OK;
}

// Decode a whole SPHERE file buffer into interleaved int16.
// Returns frames (samples per channel) or a negative error.
inline int64_t decode(const uint8_t* data, int64_t size,
                      std::vector<int16_t>* out, SphereInfo* info) {
  const int rc = parse_header(data, size, info);
  if (rc != OK) return rc;
  const uint8_t* payload = data + info->header_size;
  const int64_t psize = size - info->header_size;
  const int64_t n = info->sample_count;
  const int c = info->channels;
  const std::string& coding = info->coding;

  if (coding.find("wavpack") != std::string::npos) return ERR_UNSUPPORTED;
  if (coding.find("shorten") != std::string::npos) {
    int nchan = 0;
    // headroom for the final padded block, bounding decompression bombs
    const int64_t got =
        shn::decode(payload, psize, out, &nchan, n + ((int64_t)1 << 20));
    if (got < 0) return got;
    if (nchan != c || got < n) return ERR_TRUNCATED;
    out->resize((size_t)(n * c));  // trailing padding blocks trimmed
    return n;
  }
  if (coding.rfind("ulaw", 0) == 0 || coding.rfind("mu-law", 0) == 0) {
    if (psize < n * c) return ERR_TRUNCATED;
    out->resize((size_t)(n * c));
    for (int64_t i = 0; i < n * c; i++)
      (*out)[(size_t)i] = shn::ulaw_to_int16(payload[i]);
    return n;
  }
  if (info->sample_n_bytes == 2) {
    if (psize < 2 * n * c) return ERR_TRUNCATED;
    const bool big_endian = info->byte_format == "10";
    out->resize((size_t)(n * c));
    for (int64_t i = 0; i < n * c; i++) {
      const uint8_t b0 = payload[2 * i], b1 = payload[2 * i + 1];
      (*out)[(size_t)i] = big_endian ? (int16_t)((b0 << 8) | b1)
                                     : (int16_t)((b1 << 8) | b0);
    }
    return n;
  }
  if (info->sample_n_bytes == 1) {
    if (psize < n * c) return ERR_TRUNCATED;
    out->resize((size_t)(n * c));
    for (int64_t i = 0; i < n * c; i++)
      (*out)[(size_t)i] = (int16_t)(((int16_t)(int8_t)payload[i]) << 8);
    return n;
  }
  return ERR_UNSUPPORTED;
}

}  // namespace sphere_core

#endif  // SPEECH_TPU_SPHERE_CORE_H_
