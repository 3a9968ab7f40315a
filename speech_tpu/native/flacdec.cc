// Native FLAC decoder (C-ABI, consumed via ctypes — speech_tpu/native/flacdec.py).
//
// Replaces the reference's soundfile/libsndfile FLAC path (reference
// speech/utils/wave.py:8-10) so the LibriSpeech corpus is readable in place
// with no external tools. The bitstream core lives in flac_core.h (shared
// with featurizer.cc); semantics match the pure-Python reference decoder
// speech_tpu/utils/flac.py exactly (parity-tested in tests/flac_test.py).
//
// Build: python speech_tpu/native/setup.py  (plain shared object, no Python.h)

#include "flac_core.h"

using namespace flac_core;

extern "C" {

// STREAMINFO probe. Returns 0 or a negative error.
int stpu_flac_info(const char* path, int* sample_rate, int* channels,
                   int* bits, int64_t* total_samples) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc != OK) return rc;
  StreamInfo si;
  rc = parse_streaminfo(buf.data(), buf.size(), &si);
  if (rc != OK) return rc;
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  *bits = si.bits;
  *total_samples = si.total_samples;
  return OK;
}

// Decode the whole file into out (interleaved int16, `capacity` total
// elements). Returns samples-per-channel decoded, or a negative error.
int64_t stpu_flac_read(const char* path, int16_t* out, int64_t capacity,
                       int* sample_rate, int* channels) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc != OK) return rc;
  StreamInfo si;
  std::vector<int16_t> decoded;
  int64_t n = decode_stream(buf.data(), buf.size(), &decoded, &si);
  if (n < 0) return n;
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  if ((int64_t)decoded.size() > capacity) return ERR_CAPACITY;
  memcpy(out, decoded.data(), decoded.size() * sizeof(int16_t));
  return n;
}

}  // extern "C"
