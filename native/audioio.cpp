// Native audio-ingest runtime: WAV decode + mono downmix + polyphase
// resample + fixed-chunk framing.
//
// TPU-native analog of the reference's host-side ingest hot loop
// (librosa.load resampling at /root/reference/code/create_train_dataset.py:204,
// re-loading a noise wav PER FRAME at :215-219 — the dominant offline cost,
// SURVEY.md §3.1). The Python fallback lives in
// audiodenoiser_tpu/data/wav_io.py; this library decodes and resamples many
// files in parallel (one thread per file via std::thread) feeding the
// device pipeline.
//
// Resampling matches scipy.signal.resample_poly(y, up, down) semantics —
// polyphase upfirdn with a Kaiser(5.0)-windowed sinc of half-length
// 10*max(up,down) — so the native and Python paths agree within float
// tolerance (asserted in tests/test_native.py).
//
// Exported C ABI (see audiodenoiser_tpu/data/native.py):
//   adio_load_wav(path, target_sr, out*, len*)       -> 0 on success
//   adio_free(ptr)
//   adio_load_batch(paths[], n, target_sr, chunk, out*, nchunks*) -> chunks
//   adio_version()

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono
  uint32_t sample_rate = 0;
};

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }

// Minimal RIFF/WAVE parser: PCM (8/16/24/32-bit) and IEEE float32/64.
bool decode_wav(const char* path, Wav& out) {
  std::vector<uint8_t> b;
  if (!read_file(path, b) || b.size() < 44) return false;
  if (std::memcmp(b.data(), "RIFF", 4) || std::memcmp(b.data() + 8, "WAVE", 4))
    return false;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;
  while (pos + 8 <= b.size()) {
    const uint8_t* hdr = b.data() + pos;
    uint32_t sz = rd32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (!std::memcmp(hdr, "fmt ", 4) && sz >= 16) {
      fmt = rd16(body);
      channels = rd16(body + 2);
      rate = rd32(body + 4);
      bits = rd16(body + 14);
      if (fmt == 0xFFFE && sz >= 40) fmt = rd16(body + 24);  // extensible
    } else if (!std::memcmp(hdr, "data", 4)) {
      data = body;
      data_len = std::min<uint32_t>(sz, static_cast<uint32_t>(b.size() - pos - 8));
    }
    pos += 8 + sz + (sz & 1);
  }
  if (!data || !channels || !rate) return false;
  if (bits != 8 && bits != 16 && bits != 24 && bits != 32 && bits != 64)
    return false;  // malformed fmt chunk: avoid a divide-by-zero SIGFPE
  const size_t bytes_per = bits / 8;
  const size_t frames = data_len / (bytes_per * channels);
  out.sample_rate = rate;
  out.samples.resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (unsigned c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (fmt == 1) {  // integer PCM
        if (bits == 16) {
          v = static_cast<int16_t>(rd16(p)) / 32768.0;
        } else if (bits == 32) {
          v = static_cast<int32_t>(rd32(p)) / 2147483648.0;
        } else if (bits == 24) {
          int32_t s = (p[0] << 8) | (p[1] << 16) | (uint32_t(p[2]) << 24);
          v = (s >> 8) / 8388608.0;
        } else if (bits == 8) {
          v = (static_cast<double>(p[0]) - 128.0) / 128.0;
        } else {
          return false;
        }
      } else if (fmt == 3) {  // IEEE float
        if (bits == 32) {
          float fv;
          std::memcpy(&fv, p, 4);
          v = fv;
        } else if (bits == 64) {
          double dv;
          std::memcpy(&dv, p, 8);
          v = dv;
        } else {
          return false;
        }
      } else {
        return false;
      }
      acc += v;
    }
    out.samples[i] = static_cast<float>(acc / channels);
  }
  return true;
}

double bessel_i0(double x) {
  // series expansion, converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  const double y = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= y / (double(k) * k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

// scipy.signal.resample_poly-equivalent filter: firwin(2*10*M+1, 1/M,
// window=('kaiser', 5.0)) scaled by up, M = max(up, down).
std::vector<double> design_filter(int up, int down) {
  const int m = std::max(up, down);
  const int half = 10 * m;
  const int n = 2 * half + 1;
  const double cutoff = 1.0 / m;  // normalized to Nyquist
  std::vector<double> h(n);
  const double beta = 5.0;
  const double denom = bessel_i0(beta);
  double sum = 0.0;
  for (int i = 0; i < n; ++i) {
    const double t = i - half;
    const double sinc =
        t == 0 ? cutoff : std::sin(M_PI * cutoff * t) / (M_PI * t);
    const double r = 2.0 * i / (n - 1) - 1.0;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[i] = sinc * w;
    sum += h[i];
  }
  // firwin normalizes DC gain to 1; resample_poly scales by `up`
  for (auto& v : h) v = v / sum * up;
  return h;
}

// upfirdn(h, x, up, down) with scipy resample_poly's output length.
std::vector<float> resample_poly(const std::vector<float>& x, int up, int down) {
  if (up == down) return x;
  const auto h = design_filter(up, down);
  const int64_t nh = static_cast<int64_t>(h.size());
  const int64_t half = (nh - 1) / 2;
  const int64_t n_in = static_cast<int64_t>(x.size());
  const int64_t n_out = (n_in * up + down - 1) / down;  // ceil
  std::vector<float> y(static_cast<size_t>(n_out));
  // scipy centers the filter: output m corresponds to upsampled index
  // m*down + half of the zero-stuffed, filtered stream.
  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t up_idx = m * down + half;
    // contributions from x[k] placed at up-sample positions k*up
    // h index = up_idx - k*up must be in [0, nh)
    int64_t k_min = (up_idx - (nh - 1) + up - 1) / up;  // ceil
    if (k_min < 0) k_min = 0;
    int64_t k_max = up_idx / up;
    if (k_max > n_in - 1) k_max = n_in - 1;
    double acc = 0.0;
    for (int64_t k = k_min; k <= k_max; ++k) {
      acc += h[static_cast<size_t>(up_idx - k * up)] * x[static_cast<size_t>(k)];
    }
    y[static_cast<size_t>(m)] = static_cast<float>(acc);
  }
  return y;
}

int gcd_int(int a, int b) { return b == 0 ? a : gcd_int(b, a % b); }

bool load_wav_resampled(const char* path, int target_sr, std::vector<float>& out) {
  Wav w;
  if (!decode_wav(path, w)) return false;
  if (target_sr > 0 && static_cast<int>(w.sample_rate) != target_sr) {
    const int g = gcd_int(static_cast<int>(w.sample_rate), target_sr);
    out = resample_poly(w.samples, target_sr / g, static_cast<int>(w.sample_rate) / g);
  } else {
    out = std::move(w.samples);
  }
  return true;
}

}  // namespace

extern "C" {

int adio_version() { return 1; }

// Decode one wav (mono-downmixed, resampled). Caller frees with adio_free.
int adio_load_wav(const char* path, int target_sr, float** out, int64_t* out_len) {
  std::vector<float> y;
  if (!load_wav_resampled(path, target_sr, y)) return -1;
  float* buf = static_cast<float*>(std::malloc(y.size() * sizeof(float)));
  if (!buf) return -2;
  std::memcpy(buf, y.data(), y.size() * sizeof(float));
  *out = buf;
  *out_len = static_cast<int64_t>(y.size());
  return 0;
}

void adio_free(float* p) { std::free(p); }

// Decode+resample+chunk a batch of files in parallel. Returns the number of
// chunks written (each `chunk` samples, non-overlapping, remainder dropped),
// or -1 on any decode failure. Caller frees *out with adio_free.
int64_t adio_load_batch(const char** paths, int n_paths, int target_sr,
                        int64_t chunk, float** out) {
  std::vector<std::vector<float>> results(static_cast<size_t>(n_paths));
  std::vector<int> ok(static_cast<size_t>(n_paths), 0);
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  for (unsigned t = 0; t < std::min<unsigned>(hw, n_paths); ++t) {
    pool.emplace_back([&, t]() {
      for (int i = static_cast<int>(t); i < n_paths; i += static_cast<int>(std::min<unsigned>(hw, n_paths))) {
        ok[i] = load_wav_resampled(paths[i], target_sr, results[i]) ? 1 : 0;
      }
    });
  }
  for (auto& th : pool) th.join();
  int64_t total_chunks = 0;
  for (int i = 0; i < n_paths; ++i) {
    if (!ok[i]) return -1;
    total_chunks += static_cast<int64_t>(results[i].size()) / chunk;
  }
  float* buf = static_cast<float*>(std::malloc(
      static_cast<size_t>(total_chunks) * chunk * sizeof(float)));
  if (!buf) return -2;
  int64_t c = 0;
  for (int i = 0; i < n_paths; ++i) {
    const int64_t k = static_cast<int64_t>(results[i].size()) / chunk;
    for (int64_t j = 0; j < k; ++j, ++c) {
      std::memcpy(buf + c * chunk, results[i].data() + j * chunk,
                  chunk * sizeof(float));
    }
  }
  *out = buf;
  return total_chunks;
}

}  // extern "C"
