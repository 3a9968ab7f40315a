// Native host-side data pipeline: WAV decode + log-spectrogram featurization
// with an internal thread pool.
//
// This is the TPU-native equivalent of the reference's fork-based DataLoader
// worker processes (reference: speech/loader.py:139-150, num_workers=4) — the
// hot host path (read wav -> frame -> window -> rFFT -> PSD scale -> log ->
// normalize) runs entirely outside the Python interpreter, so a single
// process overlaps featurization for the whole next batch with device
// compute. Numerics match speech_tpu/data/features.py:log_specgram_np, which
// in turn matches the reference's scipy log_specgram (speech/loader.py:156-166):
// periodic hann window, PSD 'density' scaling with one-sided doubling, and
// log(float32(spec) + 1e-10f).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All FFT math is double precision (Bluestein chirp-z over a power-of-two
// radix-2 FFT, so any nperseg works — 320 samples at 16 kHz / 20 ms).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <complex>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "flac_core.h"    // FLAC corpora (LibriSpeech) decode in-pipeline
#include "sphere_core.h"  // NIST SPHERE + shorten (TIMIT, WSJ) in-pipeline

namespace {

using cd = std::complex<double>;
constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// Radix-2 iterative FFT (in place), double precision.
// ---------------------------------------------------------------------------

struct FftTables {
  size_t n;
  std::vector<size_t> bitrev;      // bit-reversal permutation
  std::vector<cd> roots;           // roots[len/2 + j] = exp(-2*pi*i*j/len)
  explicit FftTables(size_t n_) : n(n_) {
    bitrev.resize(n);
    for (size_t i = 1, j = 0; i < n; i++) {
      size_t bit = n >> 1;
      for (; j & bit; bit >>= 1) j ^= bit;
      j ^= bit;
      bitrev[i] = j;
    }
    roots.resize(n);
    for (size_t len = 2; len <= n; len <<= 1) {
      for (size_t j = 0; j < len / 2; j++) {
        const double ang = -2 * kPi * (double)j / (double)len;
        roots[len / 2 + j] = cd(std::cos(ang), std::sin(ang));
      }
    }
  }
};

// In-place forward/inverse FFT with precomputed tables. Inverse skips the
// 1/n scaling (folded into the Bluestein chirp by the caller).
void fft_pow2(cd* a, const FftTables& t, bool invert) {
  const size_t n = t.n;
  for (size_t i = 1; i < n; i++) {
    const size_t j = t.bitrev[i];
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const cd* w = &t.roots[len / 2];
    for (size_t i = 0; i < n; i += len) {
      cd* lo = a + i;
      cd* hi = a + i + len / 2;
      for (size_t j = 0; j < len / 2; j++) {
        const cd wj = invert ? std::conj(w[j]) : w[j];
        const cd u = lo[j], v = hi[j] * wj;
        lo[j] = u + v;
        hi[j] = u - v;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Bluestein chirp-z plan for an arbitrary-length forward DFT. Thread-safe to
// *use* after construction (workers share a const plan).
// ---------------------------------------------------------------------------

struct BluesteinPlan {
  size_t n;        // transform length (nperseg)
  size_t m;        // power-of-two convolution length >= 2n-1
  FftTables tables;         // shared twiddle/bit-reverse tables for size m
  std::vector<cd> chirp;    // w_j = exp(-i*pi*j^2/n), j in [0, n)
  std::vector<cd> b_fft;    // FFT of the wrapped conjugate-chirp kernel, /m

  static size_t conv_len(size_t n_) {
    size_t m = 1;
    while (m < 2 * n_ - 1) m <<= 1;
    return m;
  }

  explicit BluesteinPlan(size_t n_)
      : n(n_), m(conv_len(n_)), tables(conv_len(n_)) {
    chirp.resize(n);
    for (size_t j = 0; j < n; j++) {
      // j^2 mod 2n keeps the angle argument small for precision.
      const double r = (double)((j * j) % (2 * n));
      const double ang = -kPi * r / (double)n;
      chirp[j] = cd(std::cos(ang), std::sin(ang));
    }
    std::vector<cd> b(m, cd(0));
    for (size_t j = 0; j < n; j++) {
      const cd cj = std::conj(chirp[j]);
      b[j] = cj;
      if (j) b[m - j] = cj;
    }
    fft_pow2(b.data(), tables, false);
    // Fold the inverse FFT's 1/m normalization into the kernel.
    for (cd& x : b) x /= (double)m;
    b_fft = std::move(b);
  }

  // DFT of the complex sequence z = x1 + i*x2 (two real frames packed into
  // one transform — halves FFT work per frame), writing the one-sided POWER
  // spectra |DFT(x1)|^2 and |DFT(x2)|^2 for bins [0, nbins). x2 may be null
  // (treated as zeros; p2 then receives garbage-free zeros of X2 == 0 only if
  // x2 is all zero — callers pass null only for a discarded odd tail frame).
  void forward_pair_power(const double* x1, const double* x2, size_t nbins,
                          double* p1, double* p2,
                          std::vector<cd>& scratch) const {
    scratch.resize(m);
    cd* s = scratch.data();
    if (x2) {
      for (size_t j = 0; j < n; j++) s[j] = cd(x1[j], x2[j]) * chirp[j];
    } else {
      for (size_t j = 0; j < n; j++) s[j] = x1[j] * chirp[j];
    }
    std::fill(s + n, s + m, cd(0));
    fft_pow2(s, tables, false);
    for (size_t j = 0; j < m; j++) s[j] *= b_fft[j];
    fft_pow2(s, tables, true);
    // Z_k = s[k] * chirp[k]; recover the two real-input DFTs via conjugate
    // symmetry: X1_k = (Z_k + conj(Z_{n-k}))/2, X2_k = (Z_k - conj(Z_{n-k}))/(2i).
    for (size_t k = 0; k < nbins; k++) {
      const cd zk = s[k] * chirp[k];
      const size_t kr = k == 0 ? 0 : n - k;
      const cd zr = s[kr] * chirp[kr];
      const double a = zk.real(), b_ = zk.imag();
      const double c = zr.real(), d = zr.imag();
      p1[k] = 0.25 * ((a + c) * (a + c) + (b_ - d) * (b_ - d));
      if (p2) p2[k] = 0.25 * ((b_ + d) * (b_ + d) + (a - c) * (a - c));
    }
  }
};

// ---------------------------------------------------------------------------
// Mixed-radix (2/5) complex FFT — the fast path for the common speech rates
// (16 kHz -> nperseg 320 -> half-size 160 = 2^5*5; 8 kHz -> 80 = 2^4*5).
// Recursive decimation-in-time with a single precomputed root table.
// ---------------------------------------------------------------------------

struct MixedRadixFFT {
  size_t n = 0;
  bool ok = false;
  std::vector<cd> roots;  // roots[j] = exp(-2*pi*i*j/n)

  explicit MixedRadixFFT(size_t n_) : n(n_) {
    size_t r = n;
    while (r % 2 == 0) r /= 2;
    while (r % 5 == 0) r /= 5;
    ok = (r == 1) && n >= 1;
    if (!ok) return;
    roots.resize(n);
    for (size_t j = 0; j < n; j++) {
      const double ang = -2 * kPi * (double)j / (double)n;
      roots[j] = cd(std::cos(ang), std::sin(ang));
    }
  }

  // out-of-place forward FFT: out[k] = sum_j x[j*stride] w_n^{jk}.
  void forward(const cd* x, cd* out) const { rec(x, n, 1, 1, out); }

 private:
  void rec(const cd* x, size_t len, size_t stride, size_t root_step,
           cd* out) const {
    if (len == 1) { out[0] = x[0]; return; }
    if (len == 2) {
      out[0] = x[0] + x[stride];
      out[1] = x[0] - x[stride];
      return;
    }
    if (len % 2 == 0) {
      const size_t h = len / 2;
      rec(x, h, stride * 2, root_step * 2, out);
      rec(x + stride, h, stride * 2, root_step * 2, out + h);
      for (size_t k = 0; k < h; k++) {
        const cd t = out[h + k] * roots[k * root_step];
        const cd u = out[k];
        out[k] = u + t;
        out[h + k] = u - t;
      }
      return;
    }
    // len % 5 == 0 by construction.
    const size_t f = len / 5;
    for (size_t r = 0; r < 5; r++)
      rec(x + r * stride, f, stride * 5, root_step * 5, out + r * f);
    const size_t w5 = root_step * f;  // roots index step for w_5 = w_len^f
    const cd w51 = roots[w5 % n], w52 = roots[(2 * w5) % n],
             w53 = roots[(3 * w5) % n], w54 = roots[(4 * w5) % n];
    for (size_t k = 0; k < f; k++) {
      const cd t0 = out[k];
      const cd t1 = out[f + k] * roots[(k * root_step) % n];
      const cd t2 = out[2 * f + k] * roots[(2 * k * root_step) % n];
      const cd t3 = out[3 * f + k] * roots[(3 * k * root_step) % n];
      const cd t4 = out[4 * f + k] * roots[(4 * k * root_step) % n];
      out[k] = t0 + t1 + t2 + t3 + t4;
      out[f + k] = t0 + t1 * w51 + t2 * w52 + t3 * w53 + t4 * w54;
      out[2 * f + k] = t0 + t1 * w52 + t2 * w54 + t3 * w51 + t4 * w53;
      out[3 * f + k] = t0 + t1 * w53 + t2 * w51 + t3 * w54 + t4 * w52;
      out[4 * f + k] = t0 + t1 * w54 + t2 * w53 + t3 * w52 + t4 * w51;
    }
  }
};

// Featurization FFT plan: mixed-radix real-packed rFFT when the half length
// factors into 2s and 5s, Bluestein chirp-z otherwise (any nperseg).
struct FeatPlan {
  size_t n;                                  // nperseg
  std::unique_ptr<MixedRadixFFT> mixed;      // size n/2, when usable
  std::unique_ptr<BluesteinPlan> bluestein;  // fallback
  std::vector<cd> unpack;                    // exp(-2*pi*i*k/n), k in [0, n/2)

  explicit FeatPlan(size_t n_) : n(n_) {
    if (n % 2 == 0) {
      auto mr = std::make_unique<MixedRadixFFT>(n / 2);
      if (mr->ok) {
        mixed = std::move(mr);
        unpack.resize(n / 2);
        for (size_t k = 0; k < n / 2; k++) {
          const double ang = -2 * kPi * (double)k / (double)n;
          unpack[k] = cd(std::cos(ang), std::sin(ang));
        }
      }
    }
    if (!mixed) bluestein = std::make_unique<BluesteinPlan>(n);
  }

  // One-sided power spectrum of one real frame via the packed half-size
  // complex FFT: z_j = x_{2j} + i x_{2j+1}; X_k from conjugate symmetry.
  void rfft_power(const double* x, size_t nbins, double* p,
                  std::vector<cd>& scratch) const {
    const size_t h = n / 2;
    scratch.resize(2 * h);
    cd* z = scratch.data();
    cd* zf = z + h;
    for (size_t j = 0; j < h; j++) z[j] = cd(x[2 * j], x[2 * j + 1]);
    mixed->forward(z, zf);
    for (size_t k = 0; k < nbins; k++) {
      if (k == h) {  // Nyquist: X_h = Re(Z_0) - Im(Z_0)
        const double v = zf[0].real() - zf[0].imag();
        p[k] = v * v;
        continue;
      }
      const cd zk = zf[k];
      const cd zr = std::conj(zf[(h - k) % h]);
      const cd xe = 0.5 * (zk + zr);
      const cd xo = cd(0, -0.5) * (zk - zr);
      const cd xk = xe + unpack[k] * xo;
      p[k] = std::norm(xk);
    }
  }
};

std::mutex g_plan_mu;
std::unordered_map<size_t, std::unique_ptr<FeatPlan>> g_plans;

const FeatPlan& get_plan(size_t n) {
  std::lock_guard<std::mutex> lk(g_plan_mu);
  auto it = g_plans.find(n);
  if (it == g_plans.end()) {
    it = g_plans.emplace(n, std::make_unique<FeatPlan>(n)).first;
  }
  return *it->second;
}

// ---------------------------------------------------------------------------
// WAV (RIFF PCM) reader. Mirrors speech_tpu/utils/wave.py: int16 payload
// (8-bit recentred, 32-bit truncated), multi-channel averaged to mono as
// float64 — exactly what log_specgram_np does before framing.
// ---------------------------------------------------------------------------

struct WavInfo {
  int sample_rate = 0;
  int64_t n_frames = 0;  // per-channel samples
  int channels = 0;
  int bits = 0;
  int64_t data_offset = 0;
  int64_t data_bytes = 0;
};

bool read_wav_header(FILE* f, WavInfo* info) {
  char tag[4];
  uint32_t riff_size;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4) != 0) return false;
  bool have_fmt = false;
  while (fread(tag, 1, 4, f) == 4) {
    uint32_t chunk_size;
    if (fread(&chunk_size, 4, 1, f) != 1) return false;
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint16_t fmt_code, channels, block_align, bits;
      uint32_t rate, byte_rate;
      if (chunk_size < 16) return false;
      if (fread(&fmt_code, 2, 1, f) != 1 || fread(&channels, 2, 1, f) != 1 ||
          fread(&rate, 4, 1, f) != 1 || fread(&byte_rate, 4, 1, f) != 1 ||
          fread(&block_align, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        return false;
      if (fmt_code != 1 && fmt_code != 0xFFFE) return false;  // PCM only
      info->channels = channels;
      info->sample_rate = (int)rate;
      info->bits = bits;
      if (chunk_size > 16 && fseek(f, (long)(chunk_size - 16), SEEK_CUR) != 0)
        return false;
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = chunk_size;
      if (!have_fmt || info->channels <= 0 || info->bits <= 0) return false;
      const int bytes_per = info->bits / 8;
      info->n_frames = info->data_bytes / (bytes_per * info->channels);
      return true;
    } else {
      // Skip unknown chunk (word-aligned).
      if (fseek(f, (long)(chunk_size + (chunk_size & 1)), SEEK_CUR) != 0)
        return false;
    }
  }
  return false;
}

// True when the file starts with the FLAC stream magic.
bool is_flac_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  return got == 4 && memcmp(magic, "fLaC", 4) == 0;
}

// Decodes a FLAC file into mono float64 (int16-valued, channel-averaged) —
// the same contract as read_wav_mono, so featurization is container-blind.
int64_t read_flac_mono(const char* path, std::vector<double>* out,
                       int* sample_rate) {
  std::vector<uint8_t> buf;
  if (flac_core::read_file(path, &buf) != flac_core::OK) return -1;
  flac_core::StreamInfo si;
  std::vector<int16_t> pcm;
  const int64_t n = flac_core::decode_stream(buf.data(), buf.size(), &pcm, &si);
  if (n < 0) return -2;
  const int c = si.channels;
  out->resize((size_t)n);
  for (int64_t i = 0; i < n; i++) {
    double acc = 0;
    for (int k = 0; k < c; k++) acc += (double)pcm[(size_t)(i * c + k)];
    (*out)[(size_t)i] = acc / c;
  }
  *sample_rate = si.sample_rate;
  return n;
}

// True when the file starts with the NIST SPHERE magic.
bool is_sphere_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char magic[7] = {0};
  size_t got = fread(magic, 1, 7, f);
  fclose(f);
  return got == 7 && memcmp(magic, "NIST_1A", 7) == 0;
}

// Decodes a NIST SPHERE file (PCM both endians / mu-law / embedded-shorten)
// into mono float64 — same contract as read_wav_mono.
int64_t read_sphere_mono(const char* path, std::vector<double>* out,
                         int* sample_rate) try {
  std::vector<uint8_t> buf;
  if (flac_core::read_file(path, &buf) != flac_core::OK) return -1;
  sphere_core::SphereInfo si;
  std::vector<int16_t> pcm;
  const int64_t n = sphere_core::decode(buf.data(), (int64_t)buf.size(),
                                        &pcm, &si);
  if (n < 0) return -2;
  const int c = si.channels;
  out->resize((size_t)n);
  for (int64_t i = 0; i < n; i++) {
    double acc = 0;
    for (int k = 0; k < c; k++) acc += (double)pcm[(size_t)(i * c + k)];
    (*out)[(size_t)i] = acc / c;
  }
  *sample_rate = si.sample_rate;
  return n;
} catch (...) {
  // bad_alloc etc. must not unwind through the thread-pool workers
  return -2;
}

// Reads a wav (or FLAC / NIST SPHERE, dispatched by magic) into mono float64
// (int16-valued, channel-averaged). Returns frames or a negative error code.
int64_t read_wav_mono(const char* path, std::vector<double>* out,
                      int* sample_rate) {
  if (is_flac_file(path)) return read_flac_mono(path, out, sample_rate);
  if (is_sphere_file(path)) return read_sphere_mono(path, out, sample_rate);
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_wav_header(f, &info)) { fclose(f); return -2; }
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) { fclose(f); return -2; }
  const int64_t n = info.n_frames;
  const int c = info.channels;
  std::vector<uint8_t> raw((size_t)info.data_bytes);
  if (fread(raw.data(), 1, (size_t)info.data_bytes, f) !=
      (size_t)info.data_bytes) { fclose(f); return -2; }
  fclose(f);
  out->resize((size_t)n);
  if (info.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(raw.data());
    for (int64_t i = 0; i < n; i++) {
      double acc = 0;
      for (int k = 0; k < c; k++) acc += (double)s[i * c + k];
      (*out)[(size_t)i] = acc / c;
    }
  } else if (info.bits == 8) {
    const uint8_t* s = raw.data();
    for (int64_t i = 0; i < n; i++) {
      double acc = 0;
      for (int k = 0; k < c; k++)
        acc += (double)(int16_t)(((int16_t)s[i * c + k] - 128) << 8);
      (*out)[(size_t)i] = acc / c;
    }
  } else if (info.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(raw.data());
    for (int64_t i = 0; i < n; i++) {
      double acc = 0;
      for (int k = 0; k < c; k++) acc += (double)(int16_t)(s[i * c + k] >> 16);
      (*out)[(size_t)i] = acc / c;
    }
  } else {
    return -3;
  }
  *sample_rate = info.sample_rate;
  return n;
}

// ---------------------------------------------------------------------------
// Featurization core (per utterance).
// ---------------------------------------------------------------------------

struct StftParams {
  int64_t nperseg;
  int64_t hop;
  int64_t nbins;
};

StftParams stft_params(int sample_rate, int window_ms, int step_ms) {
  StftParams p;
  p.nperseg = (int64_t)(window_ms * sample_rate / 1000);
  const int64_t noverlap = (int64_t)(step_ms * sample_rate / 1000);
  p.hop = p.nperseg - noverlap;
  p.nbins = p.nperseg / 2 + 1;
  return p;
}

// out must hold t * nbins floats; mean/stdv (nbins) may be null (no
// normalization). Returns number of frames written, or negative error.
int64_t log_specgram_core(const double* audio, int64_t n_samples,
                          int sample_rate, int window_ms, int step_ms,
                          const float* mean, const float* stdv, float* out) {
  const StftParams p = stft_params(sample_rate, window_ms, step_ms);
  if (n_samples < p.nperseg) return -4;
  const int64_t t = 1 + (n_samples - p.nperseg) / p.hop;
  const FeatPlan& plan = get_plan((size_t)p.nperseg);

  std::vector<double> win((size_t)p.nperseg);
  double win_sq = 0;
  for (int64_t i = 0; i < p.nperseg; i++) {
    win[(size_t)i] = 0.5 - 0.5 * std::cos(2.0 * kPi * (double)i / (double)p.nperseg);
    win_sq += win[(size_t)i] * win[(size_t)i];
  }
  const double scale = 1.0 / ((double)sample_rate * win_sq);
  const bool even = (p.nperseg % 2) == 0;

  std::vector<double> frame1((size_t)p.nperseg), frame2((size_t)p.nperseg);
  std::vector<double> pow1((size_t)p.nbins), pow2((size_t)p.nbins);
  std::vector<cd> scratch;
  auto emit = [&](int64_t fr, const double* pw) {
    float* row = out + fr * p.nbins;
    for (int64_t k = 0; k < p.nbins; k++) {
      double v = pw[k] * scale;
      if (k > 0 && (k < p.nbins - 1 || !even)) v *= 2.0;
      // Match numpy: cast to float32 BEFORE adding eps, logf in float32.
      float fv = std::log((float)v + 1e-10f);
      if (mean) fv = (fv - mean[k]) / stdv[k];
      row[k] = fv;
    }
  };
  if (plan.mixed) {
    // Fast path: real-packed mixed-radix rFFT, one frame per transform.
    for (int64_t fr = 0; fr < t; fr++) {
      const double* src = audio + fr * p.hop;
      for (int64_t i = 0; i < p.nperseg; i++)
        frame1[(size_t)i] = src[i] * win[(size_t)i];
      plan.rfft_power(frame1.data(), (size_t)p.nbins, pow1.data(), scratch);
      emit(fr, pow1.data());
    }
    return t;
  }
  // Fallback: two real frames per complex Bluestein pass (conjugate split).
  for (int64_t fr = 0; fr < t; fr += 2) {
    const double* src1 = audio + fr * p.hop;
    for (int64_t i = 0; i < p.nperseg; i++)
      frame1[(size_t)i] = src1[i] * win[(size_t)i];
    const bool pair = fr + 1 < t;
    if (pair) {
      const double* src2 = audio + (fr + 1) * p.hop;
      for (int64_t i = 0; i < p.nperseg; i++)
        frame2[(size_t)i] = src2[i] * win[(size_t)i];
    }
    plan.bluestein->forward_pair_power(
        frame1.data(), pair ? frame2.data() : nullptr, (size_t)p.nbins,
        pow1.data(), pair ? pow2.data() : nullptr, scratch);
    emit(fr, pow1.data());
    if (pair) emit(fr + 1, pow2.data());
  }
  return t;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Probe an audio header (RIFF wav, FLAC STREAMINFO, or SPHERE header).
// Returns 0 on success.
int stpu_wav_info(const char* path, int* sample_rate, int64_t* n_samples) {
  if (is_sphere_file(path)) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    // headers are usually 1024 bytes but the size is declared on line 2;
    // 16 KiB covers any real corpus header
    std::vector<uint8_t> head(16384);
    const size_t got = fread(head.data(), 1, head.size(), f);
    fclose(f);
    sphere_core::SphereInfo si;
    if (sphere_core::parse_header(head.data(), (int64_t)got, &si) !=
        sphere_core::OK)
      return -2;
    *sample_rate = si.sample_rate;
    *n_samples = si.sample_count;
    return 0;
  }
  if (is_flac_file(path)) {
    // Header-only probe: STREAMINFO sits in the first metadata block.
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    // STREAMINFO is the mandatory FIRST metadata block: magic(4) +
    // block header(4) + 34-byte body — 42 bytes is enough.
    uint8_t head[42];
    const size_t got = fread(head, 1, sizeof(head), f);
    fclose(f);
    if (got < sizeof(head) || (head[4] & 0x7F) != 0) return -2;
    uint64_t v = 0;
    for (int i = 18; i < 26; i++) v = (v << 8) | head[i];
    *sample_rate = (int)(v >> 44);
    *n_samples = (int64_t)(v & (((uint64_t)1 << 36) - 1));
    return 0;
  }
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  const bool ok = read_wav_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = info.sample_rate;
  *n_samples = info.n_frames;
  return 0;
}

// Read a wav as mono float32 (int16-valued). out must hold max_samples.
// Returns frames read (clipped to max_samples) or negative error.
int64_t stpu_wav_read(const char* path, float* out, int64_t max_samples,
                      int* sample_rate) {
  std::vector<double> audio;
  int sr = 0;
  const int64_t n = read_wav_mono(path, &audio, &sr);
  if (n < 0) return n;
  const int64_t m = n < max_samples ? n : max_samples;
  for (int64_t i = 0; i < m; i++) out[i] = (float)audio[(size_t)i];
  *sample_rate = sr;
  return m;
}

// Number of STFT frames a file will produce. Returns t or negative error.
int64_t stpu_num_frames(const char* path, int window_ms, int step_ms) {
  int sr = 0;
  int64_t n = 0;
  const int rc = stpu_wav_info(path, &sr, &n);
  if (rc != 0) return rc;
  const StftParams p = stft_params(sr, window_ms, step_ms);
  if (n < p.nperseg) return -4;
  return 1 + (n - p.nperseg) / p.hop;
}

// Featurize one file. out must hold t_max * nbins floats; returns frames
// written (<= t_max implied by caller sizing) or negative error. nbins is
// validated against the file's sample rate.
int64_t stpu_log_specgram_file(const char* path, int window_ms, int step_ms,
                               const float* mean, const float* stdv,
                               int64_t nbins, float* out, int64_t t_max) {
  std::vector<double> audio;
  int sr = 0;
  const int64_t n = read_wav_mono(path, &audio, &sr);
  if (n < 0) return n;
  const StftParams p = stft_params(sr, window_ms, step_ms);
  if (p.nbins != nbins) return -5;
  const int64_t t = 1 + (n - p.nperseg) / p.hop;
  if (n < p.nperseg || t > t_max) return -6;
  return log_specgram_core(audio.data(), n, sr, window_ms, step_ms, mean,
                           stdv, out);
}

// Featurize a batch of files in parallel. paths: n C strings. out: a zeroed
// (n, t_pad, nbins) float32 buffer. t_lens: (n) int32 receives per-file frame
// counts. Each file's frames must fit t_pad (error -6 otherwise). Returns 0
// on success, or the first nonzero per-file error code.
int stpu_featurize_batch(const char** paths, int64_t n, int window_ms,
                         int step_ms, const float* mean, const float* stdv,
                         int64_t nbins, float* out, int64_t t_pad,
                         int32_t* t_lens, int n_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      const int64_t t = stpu_log_specgram_file(
          paths[i], window_ms, step_ms, mean, stdv, nbins,
          out + i * t_pad * nbins, t_pad);
      if (t < 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, (int)t);
        t_lens[i] = 0;
      } else {
        t_lens[i] = (int32_t)t;
      }
    }
  };
  int nt = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if ((int64_t)nt > n) nt = (int)n;
  std::vector<std::thread> threads;
  threads.reserve((size_t)nt);
  for (int i = 0; i < nt; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return err.load();
}

}  // extern "C"
