// Native audio I/O for dataset preparation: WAV decode + polyphase resample,
// multithreaded batch loading.
//
// The reference's dataset builder decodes and resamples one file at a time
// through librosa/audioread on a single CPU thread (reference:
// scripts/audio_to_images.py:34-41, audiodiffusion/mel.py:100) — the only
// real cost besides the mel transform, which now runs batched on the TPU.
// This library keeps the host side off the critical path: RIFF/WAV parsing
// (PCM 8/16/24/32 and float32/64), mono mixdown, Kaiser-windowed-sinc
// polyphase resampling, and a std::thread pool for whole-directory decoding.
//
// Exposed as a plain C ABI consumed via ctypes (audio_diffusion_tpu/data/
// native_audio.py); Python falls back to scipy when the library is absent.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

bool parse_wav(const char* path, Wav& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 44) { fclose(f); return false; }
  std::vector<uint8_t> buf((size_t)size);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) { fclose(f); return false; }
  fclose(f);

  if (memcmp(buf.data(), "RIFF", 4) != 0 || memcmp(buf.data() + 8, "WAVE", 4) != 0) return false;

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t chunk_len = rd_u32(chunk + 4);
    // Clamp the chunk to the actual buffer: a truncated/malformed file must
    // not cause reads past the end (the parser sees arbitrary user files).
    size_t avail = (size_t)size - (pos + 8);
    if (chunk_len > avail) chunk_len = (uint32_t)avail;
    if (memcmp(chunk, "fmt ", 4) == 0 && chunk_len >= 16) {
      format = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      sample_rate = rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
      if (format == 0xFFFE && chunk_len >= 40) format = rd_u16(chunk + 8 + 24);  // WAVE_FORMAT_EXTENSIBLE
    } else if (memcmp(chunk, "data", 4) == 0) {
      data = chunk + 8;
      data_len = chunk_len;
    }
    pos += 8 + (size_t)rd_u32(chunk + 4) + (rd_u32(chunk + 4) & 1);
  }
  if (!data || channels == 0 || sample_rate == 0) return false;

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  size_t frames = data_len / (bytes_per * channels);
  out.samples.resize(frames);
  out.sample_rate = (int)sample_rate;
  const double inv_ch = 1.0 / channels;

  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (format == 1) {  // PCM
        switch (bits) {
          case 8: v = ((int)p[0] - 128) / 128.0; break;
          case 16: v = (int16_t)rd_u16(p) / 32768.0; break;
          case 24: {
            int32_t s = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16));
            if (s & 0x800000) s |= ~0xFFFFFF;
            v = s / 8388608.0;
            break;
          }
          case 32: v = (int32_t)rd_u32(p) / 2147483648.0; break;
          default: return false;
        }
      } else if (format == 3) {  // IEEE float
        if (bits == 32) {
          float fv;
          memcpy(&fv, p, 4);
          v = fv;
        } else if (bits == 64) {
          double dv;
          memcpy(&dv, p, 8);
          v = dv;
        } else {
          return false;
        }
      } else {
        return false;
      }
      acc += v;
    }
    out.samples[i] = (float)(acc * inv_ch);
  }
  return true;
}

// ------------------------------------------------------------- resampling

double bessel_i0(double x) {
  // Series expansion; converges quickly for the beta range used here.
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Kaiser-windowed sinc low-pass, the same design scipy.signal.resample_poly
// uses (firwin, beta=5.0, half_len = 10*max(up, down), gain 'up' at DC).
std::vector<double> design_filter(int up, int down) {
  int max_rate = std::max(up, down);
  int half_len = 10 * max_rate;
  int n = 2 * half_len + 1;
  double fc = 1.0 / max_rate;  // normalized cutoff (Nyquist = 1)
  double beta = 5.0;
  double i0b = bessel_i0(beta);
  std::vector<double> h((size_t)n);
  double sum = 0.0;
  for (int i = 0; i < n; ++i) {
    double m = i - half_len;
    double sinc = (m == 0.0) ? 1.0 : std::sin(M_PI * fc * m) / (M_PI * fc * m);
    double r = m / half_len;
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[(size_t)i] = fc * sinc * w;
    sum += h[(size_t)i];
  }
  for (auto& v : h) v = v / sum * up;  // unity DC gain after upsampling
  return h;
}

std::vector<float> resample_poly(const std::vector<float>& x, int up, int down) {
  if (up == down) return x;
  std::vector<double> h = design_filter(up, down);
  int half_len = ((int)h.size() - 1) / 2;
  int64_t n_in = (int64_t)x.size();
  int64_t n_out = (n_in * up + down - 1) / down;
  std::vector<float> y((size_t)n_out);

  // Polyphase evaluation of conv(upsample(x, up), h) at stride 'down',
  // with the group delay (half_len) folded in so output is time-aligned.
  for (int64_t j = 0; j < n_out; ++j) {
    int64_t t = j * down + half_len;  // index into the upsampled+padded stream
    int64_t k0 = t % up;              // first filter tap hitting a real sample
    int64_t i0 = t / up;              // corresponding input index
    double acc = 0.0;
    for (int64_t k = k0, i = i0; k < (int64_t)h.size() && i >= 0; k += up, --i) {
      if (i < n_in) acc += h[(size_t)k] * x[(size_t)i];
    }
    y[(size_t)j] = (float)acc;
  }
  return y;
}

int64_t gcd64(int64_t a, int64_t b) { return b == 0 ? a : gcd64(b, a % b); }

bool load_one(const char* path, int target_sr, std::vector<float>& out) {
  Wav w;
  if (!parse_wav(path, w)) return false;
  if (w.sample_rate != target_sr && target_sr > 0) {
    int64_t g = gcd64(w.sample_rate, target_sr);
    out = resample_poly(w.samples, (int)(target_sr / g), (int)(w.sample_rate / g));
  } else {
    out = std::move(w.samples);
  }
  return true;
}

}  // namespace

extern "C" {

// Decode one WAV to mono float32 at target_sr. Returns 0 on success.
// Caller frees *out with adt_free.
int adt_load_wav(const char* path, int target_sr, float** out, int64_t* n_out) {
  std::vector<float> samples;
  if (!load_one(path, target_sr, samples)) return 1;
  *n_out = (int64_t)samples.size();
  *out = (float*)malloc(samples.size() * sizeof(float));
  if (!*out) return 2;
  memcpy(*out, samples.data(), samples.size() * sizeof(float));
  return 0;
}

// Decode many WAVs in parallel. outs[i] is nullptr and n_outs[i] == -1 for
// files that failed to decode. Returns the number of successes.
int adt_load_batch(const char** paths, int n, int target_sr, float** outs, int64_t* n_outs,
                   int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next{0}, ok{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      std::vector<float> samples;
      if (load_one(paths[i], target_sr, samples)) {
        outs[i] = (float*)malloc(samples.size() * sizeof(float));
        if (!outs[i]) {  // allocation failure: mark failed, don't crash
          n_outs[i] = -1;
          continue;
        }
        n_outs[i] = (int64_t)samples.size();
        memcpy(outs[i], samples.data(), samples.size() * sizeof(float));
        ok.fetch_add(1);
      } else {
        outs[i] = nullptr;
        n_outs[i] = -1;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Standalone resampler (for non-WAV sources decoded elsewhere).
int adt_resample(const float* in, int64_t n_in, int up, int down, float** out, int64_t* n_out) {
  std::vector<float> x(in, in + n_in);
  std::vector<float> y = resample_poly(x, up, down);
  *n_out = (int64_t)y.size();
  *out = (float*)malloc(y.size() * sizeof(float));
  if (!*out) return 2;
  memcpy(*out, y.data(), y.size() * sizeof(float));
  return 0;
}

void adt_free(float* p) { free(p); }

}  // extern "C"
