// FLAC bitstream decoder core, shared between the standalone decoder
// (flacdec.cc -> _flacdec.so, ctypes-bound) and the batch featurizer
// (featurizer.cc -> _featurizer.so, which decodes FLAC corpora like
// LibriSpeech in its GIL-free thread pool). Header-only (inline) so each
// shared object carries its own copy; semantics are parity-tested against
// the pure-Python reference decoder speech_tpu/utils/flac.py.

#ifndef SPEECH_TPU_NATIVE_FLAC_CORE_H_
#define SPEECH_TPU_NATIVE_FLAC_CORE_H_

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace flac_core {


// Error codes (mirrored in flacdec.py).
enum {
  OK = 0,
  ERR_OPEN = -1,
  ERR_MAGIC = -2,
  ERR_TRUNCATED = -3,
  ERR_BITSTREAM = -4,
  ERR_CAPACITY = -5,
};

struct Bits {
  const uint8_t* data;
  size_t size;       // bytes
  size_t pos = 0;    // bits
  bool ok = true;

  uint64_t read(int n) {
    if (pos + n > 8 * size) { ok = false; return 0; }
    uint64_t v = 0;
    size_t p = pos;
    int need = n;
    while (need > 0) {
      int rem = 8 - (p & 7);
      int take = need < rem ? need : rem;
      uint8_t byte = data[p >> 3];
      uint8_t chunk = (byte >> (rem - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      p += take;
      need -= take;
    }
    pos = p;
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v >> (n - 1)))
      return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  int64_t read_unary() {
    int64_t q = 0;
    while (true) {
      if (pos >= 8 * size) { ok = false; return 0; }
      int rem = 8 - (pos & 7);
      uint8_t chunk = data[pos >> 3] & ((1u << rem) - 1);
      if (chunk == 0) { q += rem; pos += rem; continue; }
      int lead = rem - (32 - __builtin_clz(chunk));
      q += lead;
      pos += lead + 1;
      return q;
    }
  }

  void align() { pos = (pos + 7) & ~(size_t)7; }
};

inline const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

struct StreamInfo {
  int sample_rate = 0, channels = 0, bits = 0;
  int64_t total_samples = 0;
  size_t frames_start = 0;  // byte offset of the first audio frame
};

inline int parse_streaminfo(const uint8_t* d, size_t n, StreamInfo* out) {
  if (n < 8 || memcmp(d, "fLaC", 4) != 0) return ERR_MAGIC;
  size_t pos = 4;
  bool have_si = false;
  while (true) {
    if (pos + 4 > n) return ERR_TRUNCATED;
    uint8_t hdr = d[pos];
    uint32_t len = ((uint32_t)d[pos + 1] << 16) | ((uint32_t)d[pos + 2] << 8) |
                   d[pos + 3];
    if (pos + 4 + len > n) return ERR_TRUNCATED;
    if ((hdr & 0x7F) == 0 && len >= 18) {
      const uint8_t* b = d + pos + 4;
      uint64_t v = 0;
      for (int i = 10; i < 18; ++i) v = (v << 8) | b[i];
      out->sample_rate = (int)(v >> 44);
      out->channels = (int)((v >> 41) & 0x7) + 1;
      out->bits = (int)((v >> 36) & 0x1F) + 1;
      out->total_samples = (int64_t)(v & (((uint64_t)1 << 36) - 1));
      have_si = true;
    }
    pos += 4 + len;
    if (hdr & 0x80) break;
  }
  if (!have_si) return ERR_MAGIC;
  out->frames_start = pos;
  return OK;
}

inline bool read_utf8_num(Bits* br, uint64_t* out) {
  uint64_t b0 = br->read(8);
  if (!br->ok) return false;
  if (b0 < 0x80) { *out = b0; return true; }
  int n_cont = 0;
  for (uint64_t mask = 0x40; b0 & mask; mask >>= 1) ++n_cont;
  if (n_cont < 1 || n_cont > 6) return false;
  uint64_t v = b0 & ((1u << (6 - n_cont)) - 1);
  for (int i = 0; i < n_cont; ++i) {
    uint64_t c = br->read(8);
    if (!br->ok || (c & 0xC0) != 0x80) return false;
    v = (v << 6) | (c & 0x3F);
  }
  *out = v;
  return true;
}

inline bool decode_residual(Bits* br, int blocksize, int order,
                     std::vector<int64_t>* resid) {
  uint64_t method = br->read(2);
  if (!br->ok || method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint64_t escape = (1u << plen) - 1;
  int porder = (int)br->read(4);
  int nparts = 1 << porder;
  if (blocksize % nparts) return false;
  int per = blocksize >> porder;
  resid->clear();
  resid->reserve(blocksize - order);
  for (int p = 0; p < nparts; ++p) {
    int cnt = per - (p == 0 ? order : 0);
    if (cnt < 0) return false;
    uint64_t param = br->read(plen);
    if (!br->ok) return false;
    if (param == escape) {
      int nbits = (int)br->read(5);
      for (int i = 0; i < cnt; ++i)
        resid->push_back(nbits ? br->read_signed(nbits) : 0);
    } else {
      for (int i = 0; i < cnt; ++i) {
        uint64_t q = (uint64_t)br->read_unary();
        uint64_t u = (q << param) | (param ? br->read((int)param) : 0);
        resid->push_back((int64_t)(u >> 1) ^ -(int64_t)(u & 1));
      }
    }
    if (!br->ok) return false;
  }
  return true;
}

inline bool decode_subframe(Bits* br, int blocksize, int bps,
                     std::vector<int64_t>* out) {
  if (br->read(1)) return false;  // padding bit must be 0
  int sftype = (int)br->read(6);
  int wasted = 0;
  if (br->read(1)) wasted = 1 + (int)br->read_unary();
  if (!br->ok) return false;
  int bps_eff = bps - wasted;
  out->assign(blocksize, 0);
  std::vector<int64_t> resid;
  if (sftype == 0) {  // CONSTANT
    int64_t v = br->read_signed(bps_eff);
    for (auto& s : *out) s = v;
  } else if (sftype == 1) {  // VERBATIM
    for (auto& s : *out) s = br->read_signed(bps_eff);
  } else if (sftype >= 8 && sftype <= 12) {  // FIXED
    int order = sftype - 8;
    for (int i = 0; i < order; ++i) (*out)[i] = br->read_signed(bps_eff);
    if (!decode_residual(br, blocksize, order, &resid)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j)
        acc += kFixedCoefs[order][j] * (*out)[i - 1 - j];
      (*out)[i] = resid[i - order] + acc;
    }
  } else if (sftype >= 32) {  // LPC
    int order = (sftype & 31) + 1;
    for (int i = 0; i < order; ++i) (*out)[i] = br->read_signed(bps_eff);
    int prec = (int)br->read(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = (int)br->read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (auto& c : coefs) c = br->read_signed(prec);
    if (!decode_residual(br, blocksize, order, &resid)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coefs[j] * (*out)[i - 1 - j];
      (*out)[i] = resid[i - order] + (acc >> shift);
    }
  } else {
    return false;
  }
  if (!br->ok) return false;
  if (wasted)
    for (auto& s : *out) s <<= wasted;
  return true;
}

inline const int kBlocksizeFixed[16] = {0,   192,  576,  1152,  2304, 4608, 0,    0,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
inline const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// Decode one frame. Returns blocksize (>0) or an error (<=0). Appends
// interleaved int16 to out (capacity-checked).
inline int64_t decode_frame(Bits* br, const StreamInfo& si, int16_t* out,
                     int64_t capacity, int64_t written) {
  if (br->read(14) != 0x3FFE) return ERR_BITSTREAM;
  br->read(2);  // reserved + blocking strategy
  int bs_code = (int)br->read(4);
  int sr_code = (int)br->read(4);
  int chan_code = (int)br->read(4);
  int ss_code = (int)br->read(3);
  br->read(1);
  uint64_t num;
  if (!read_utf8_num(br, &num)) return ERR_BITSTREAM;
  int blocksize;
  if (bs_code == 0) return ERR_BITSTREAM;
  else if (bs_code == 6) blocksize = (int)br->read(8) + 1;
  else if (bs_code == 7) blocksize = (int)br->read(16) + 1;
  else blocksize = kBlocksizeFixed[bs_code];
  if (sr_code == 12) br->read(8);
  else if (sr_code == 13 || sr_code == 14) br->read(16);
  else if (sr_code == 15) return ERR_BITSTREAM;
  int bps = ss_code == 0 ? si.bits : kSampleSizes[ss_code];
  if (bps == 0) return ERR_BITSTREAM;
  br->read(8);  // header CRC-8
  if (!br->ok) return ERR_TRUNCATED;

  std::vector<std::vector<int64_t>> chans;
  if (chan_code < 8) {
    int nch = chan_code + 1;
    chans.resize(nch);
    for (int c = 0; c < nch; ++c)
      if (!decode_subframe(br, blocksize, bps, &chans[c])) return ERR_BITSTREAM;
  } else if (chan_code <= 10) {
    chans.resize(2);
    int bps0 = bps + (chan_code == 9 ? 1 : 0);
    int bps1 = bps + (chan_code == 9 ? 0 : 1);
    if (!decode_subframe(br, blocksize, bps0, &chans[0])) return ERR_BITSTREAM;
    if (!decode_subframe(br, blocksize, bps1, &chans[1])) return ERR_BITSTREAM;
    for (int i = 0; i < blocksize; ++i) {
      int64_t c0 = chans[0][i], c1 = chans[1][i];
      int64_t l, r;
      if (chan_code == 8) { l = c0; r = c0 - c1; }          // left/side
      else if (chan_code == 9) { r = c1; l = c0 + c1; }     // side/right
      else {                                                 // mid/side
        int64_t m2 = (c0 << 1) | (c1 & 1);
        l = (m2 + c1) >> 1;
        r = (m2 - c1) >> 1;
      }
      chans[0][i] = l;
      chans[1][i] = r;
    }
  } else {
    return ERR_BITSTREAM;
  }
  br->align();
  br->read(16);  // frame CRC-16
  if (!br->ok) return ERR_TRUNCATED;

  int nch = (int)chans.size();
  if ((written + blocksize) * nch > capacity) return ERR_CAPACITY;
  int shift = si.bits - 16;
  for (int i = 0; i < blocksize; ++i)
    for (int c = 0; c < nch; ++c) {
      int64_t v = chans[c][i];
      v = shift > 0 ? (v >> shift) : (v << -shift);
      out[(written + i) * nch + c] = (int16_t)v;
    }
  return blocksize;
}

inline int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return ERR_OPEN;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(n);
  size_t got = n ? fread(buf->data(), 1, n, f) : 0;
  fclose(f);
  return got == (size_t)n ? OK : ERR_OPEN;
}


// Decode a whole in-memory FLAC stream to interleaved int16 (rescaled from
// the stream bit depth). Returns samples per channel, or a negative error.
inline int64_t decode_stream(const uint8_t* data, size_t size,
                             std::vector<int16_t>* out, StreamInfo* si) {
  int rc = parse_streaminfo(data, size, si);
  if (rc != OK) return rc;
  // Headroom for a padded final frame; truncated to the STREAMINFO total.
  int64_t cap_frames =
      (si->total_samples ? si->total_samples : ((int64_t)1 << 22)) + 65536;
  out->assign((size_t)(cap_frames * si->channels), 0);
  Bits br{data, size, si->frames_start * 8};
  int64_t written = 0;
  while (br.pos < 8 * br.size &&
         (si->total_samples == 0 || written < si->total_samples)) {
    int64_t got = decode_frame(&br, *si, out->data(),
                               cap_frames * si->channels, written);
    if (got <= 0) return got;
    written += got;
  }
  if (si->total_samples && written > si->total_samples)
    written = si->total_samples;
  out->resize((size_t)(written * si->channels));
  return written;
}

}  // namespace flac_core

#endif  // SPEECH_TPU_NATIVE_FLAC_CORE_H_
