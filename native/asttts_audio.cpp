// asttts_audio — native host-side audio data plane.
//
// Role: the reference leaned on torchaudio/libsox + ONNX Runtime C++ for its
// wav loading/resampling hot path (SURVEY §2.3.4 items 4-5); this library is
// the TPU framework's equivalent: WAV decode (PCM 8/16/24/32 + float32),
// mono mixdown, polyphase rational resampling (same filter/phase convention
// as ops/resample.py — the caller passes the designed taps), and a threaded
// batch loader that fills one padded [N, T] float32 buffer ready for
// device upload. Exposed as a C ABI consumed via ctypes
// (autostyle_tts_tpu/utils/native_audio.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Decode a RIFF/WAVE file to mono float32. Returns 0 on success.
int decode_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 44) { std::fclose(f); return -2; }
  std::vector<uint8_t> buf((size_t)size);
  if (std::fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);
  if (std::memcmp(buf.data(), "RIFF", 4) || std::memcmp(buf.data() + 8, "WAVE", 4))
    return -4;

  int channels = 0, bits = 0, fmt = 0;
  long data_off = -1, data_len = 0;
  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    uint32_t chunk_len = rd_u32(&buf[pos + 4]);
    if (!std::memcmp(&buf[pos], "fmt ", 4) && pos + 8 + 16 <= (size_t)size) {
      fmt = rd_u16(&buf[pos + 8]);
      channels = rd_u16(&buf[pos + 10]);
      out->sample_rate = (int)rd_u32(&buf[pos + 12]);
      bits = rd_u16(&buf[pos + 22]);
    } else if (!std::memcmp(&buf[pos], "data", 4)) {
      data_off = (long)(pos + 8);
      data_len = (long)std::min<uint64_t>(chunk_len, size - pos - 8);
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (data_off < 0 || channels <= 0 || bits <= 0) return -5;
  if (fmt != 1 && fmt != 3 && fmt != 0xFFFE) return -6;  // PCM / float / ext

  int bytes = bits / 8;
  long frames = data_len / (bytes * channels);
  out->samples.resize((size_t)frames);
  const uint8_t* d = &buf[(size_t)data_off];
  for (long i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = d + (i * channels + c) * bytes;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {  // float32
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        v = (double)(int16_t)rd_u16(s) / 32768.0;
      } else if (bits == 24) {
        int32_t x = (int32_t)s[0] | ((int32_t)s[1] << 8) | ((int32_t)s[2] << 16);
        if (x >= (1 << 23)) x -= (1 << 24);
        v = (double)x / 8388608.0;
      } else if (bits == 32) {
        v = (double)(int32_t)rd_u32(s) / 2147483648.0;
      } else if (bits == 8) {
        v = ((double)s[0] - 128.0) / 128.0;
      } else {
        return -7;
      }
      acc += v;
    }
    out->samples[(size_t)i] = (float)(acc / channels);
  }
  return 0;
}

// Polyphase resample matching ops/resample.py's _polyphase_plan phase math:
//   y[m] = sum_t h[phi_r + t*up] * x[b_m - t],
//   phi_r = (half + r*down) % up, b_m = (m/up)*down + (half + r*down)/up.
void resample_poly(const float* x, long n_in, const double* h, long n_taps,
                   int up, int down, float* y, long n_out) {
  long half = (n_taps - 1) / 2;
  for (long m = 0; m < n_out; ++m) {
    long r = m % up;
    long q = m / up;
    long phi = (half + r * (long)down) % up;
    long b = q * down + (half + r * (long)down) / up;
    double acc = 0.0;
    for (long j = phi, t = 0; j < n_taps; j += up, ++t) {
      long idx = b - t;
      if (idx < 0) break;           // taps run backward from b; x[<0] = 0
      if (idx >= n_in) continue;    // right zero-padding
      acc += h[j] * (double)x[idx];
    }
    y[m] = (float)acc;
  }
}

}  // namespace

extern "C" {

// Decode one wav to mono float32. Writes up to max_len samples into `out`,
// stores the file's rate in *sr and the true sample count in *n_total.
// Returns 0 on success, negative error code otherwise.
int asttts_read_wav(const char* path, float* out, long max_len, int* sr,
                    long* n_total) {
  WavData w;
  int rc = decode_wav(path, &w);
  if (rc != 0) return rc;
  *sr = w.sample_rate;
  *n_total = (long)w.samples.size();
  long n = std::min<long>((long)w.samples.size(), max_len);
  std::memcpy(out, w.samples.data(), (size_t)n * sizeof(float));
  return 0;
}

// Rational resample with caller-provided taps (float64). n_out must equal
// ceil(n_in * up / down).
int asttts_resample(const float* in, long n_in, const double* taps,
                    long n_taps, int up, int down, float* out, long n_out) {
  if (up <= 0 || down <= 0 || n_taps <= 0) return -1;
  resample_poly(in, n_in, taps, n_taps, up, down, out, n_out);
  return 0;
}

// Threaded batch loader: decode n wavs, resample each to target_sr with the
// provided taps (designed for (up, down) = reduced rate ratio per file —
// caller passes ONE (up,down,taps) set valid for files whose native rate is
// `expect_sr`; files already at target_sr skip resampling; other rates fail
// with a per-file error code). Output: out[i*stride .. i*stride+len_i) and
// lengths[i] (clipped to stride). Error codes land in status[i] (0 = ok).
int asttts_load_batch(const char** paths, int n, int target_sr, int expect_sr,
                      const double* taps, long n_taps, int up, int down,
                      float* out, long stride, long* lengths, int* status,
                      int n_threads) {
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      WavData w;
      int rc = decode_wav(paths[i], &w);
      if (rc != 0) { status[i] = rc; lengths[i] = 0; continue; }
      if (w.sample_rate == target_sr) {
        long m = std::min<long>((long)w.samples.size(), stride);
        std::memcpy(out + (size_t)i * stride, w.samples.data(),
                    (size_t)m * sizeof(float));
        lengths[i] = m;
        status[i] = 0;
      } else if (w.sample_rate == expect_sr) {
        long n_in = (long)w.samples.size();
        long n_out_full = (n_in * up + down - 1) / down;
        std::vector<float> y((size_t)n_out_full);
        resample_poly(w.samples.data(), n_in, taps, n_taps, up, down,
                      y.data(), n_out_full);
        long m = std::min<long>(n_out_full, stride);
        std::memcpy(out + (size_t)i * stride, y.data(), (size_t)m * sizeof(float));
        lengths[i] = m;
        status[i] = 0;
      } else {
        status[i] = -100 - w.sample_rate % 100;  // unexpected rate
        lengths[i] = 0;
      }
    }
  };
  int workers = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> ts;
  ts.reserve((size_t)workers);
  for (int t = 0; t < workers; ++t) ts.emplace_back(work);
  for (auto& t : ts) t.join();
  for (int i = 0; i < n; ++i)
    if (status[i] != 0) return 1;  // at least one failure (see status[])
  return 0;
}

}  // extern "C"
