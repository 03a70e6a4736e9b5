// Native audio I/O for the host decode path.
//
// The reference decodes per-track through librosa -> audioread/soxr (Python
// + ffmpeg subprocess per file; reference scripts/06:69, 10:149, 18:88).
// Here the host-side staging runs through this small C++ library:
//   - RIFF/WAVE parsing (PCM16/24/32, float32/64), multi-channel -> mono
//   - polyphase windowed-sinc resampling to the target rate (librosa loads
//     at sr=22050; quality comparable to soxr's default band-limited sinc)
//   - direct staging into a caller-provided float32 buffer (zero-copy into
//     the pinned host buffer that feeds device DMA)
// Built as a shared library, bound via ctypes (vae_hmc_tpu/io/native).
//
// Exposed C ABI:
//   int audioio_load_wav(const char* path, int target_sr, float* out,
//                        long out_capacity, long* out_len);
//     returns 0 on success, negative error codes otherwise.
//   int audioio_resample(const float* in, long in_len, int in_sr,
//                        int out_sr, float* out, long out_capacity,
//                        long* out_len);

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = IEEE float
  long data_offset = 0;
  long data_bytes = 0;
};

int parse_wav_header(FILE* f, WavInfo* info) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4) != 0) return -2;
  if (fread(&sz, 4, 1, f) != 1) return -2;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4) != 0) return -2;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (memcmp(id, "fmt ", 4) == 0) {
      uint16_t fmt, ch, block, bits;
      uint32_t rate, brate;
      if (sz < 16) return -3;
      fread(&fmt, 2, 1, f);
      fread(&ch, 2, 1, f);
      fread(&rate, 4, 1, f);
      fread(&brate, 4, 1, f);
      fread(&block, 2, 1, f);
      fread(&bits, 2, 1, f);
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = (int)rate;
      info->bits = bits;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = sz;
      return 0;
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  return -4;
}

// Decode interleaved frames -> mono float64 (mean over channels, the
// librosa to_mono convention).
int decode_to_mono(FILE* f, const WavInfo& info, std::vector<double>* mono) {
  const int ch = info.channels;
  if (ch <= 0 || info.sample_rate <= 0) return -5;
  const long bytes_per_sample = info.bits / 8;
  const long n_frames = info.data_bytes / (bytes_per_sample * ch);
  mono->resize(n_frames);
  fseek(f, info.data_offset, SEEK_SET);
  std::vector<uint8_t> buf((size_t)info.data_bytes);
  if (fread(buf.data(), 1, (size_t)info.data_bytes, f) !=
      (size_t)info.data_bytes)
    return -6;
  const uint8_t* p = buf.data();
  for (long i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* s = p + (i * ch + c) * bytes_per_sample;
      double v = 0.0;
      if (info.format == 1 && info.bits == 16) {
        int16_t x;
        memcpy(&x, s, 2);
        v = x / 32768.0;
      } else if (info.format == 1 && info.bits == 24) {
        int32_t x = (s[0] << 8) | (s[1] << 16) | ((int32_t)(int8_t)s[2] << 24);
        v = (x >> 8) / 8388608.0;
      } else if (info.format == 1 && info.bits == 32) {
        int32_t x;
        memcpy(&x, s, 4);
        v = x / 2147483648.0;
      } else if (info.format == 3 && info.bits == 32) {
        float x;
        memcpy(&x, s, 4);
        v = x;
      } else if (info.format == 3 && info.bits == 64) {
        double x;
        memcpy(&x, s, 8);
        v = x;
      } else {
        return -7;  // unsupported encoding
      }
      acc += v;
    }
    (*mono)[i] = acc / ch;
  }
  return 0;
}

// Polyphase windowed-sinc resampler (Kaiser-windowed, zero-phase FIR),
// band-limited to min(in, out) Nyquist.
void sinc_resample(const double* in, long in_len, int in_sr, int out_sr,
                   std::vector<float>* out) {
  if (in_sr == out_sr) {
    out->resize(in_len);
    for (long i = 0; i < in_len; ++i) (*out)[i] = (float)in[i];
    return;
  }
  const double ratio = (double)out_sr / in_sr;
  const long out_len = (long)llround((double)in_len * ratio);
  out->resize(out_len);
  // ideal lowpass h(t) = 2 fc sinc(2 fc t), fc in cycles per INPUT sample:
  // 0.5 * min(ratio, 1) * rolloff (anti-aliasing for downsampling)
  const int half_zeros = 32;  // sinc zero-crossings per side
  const double fc = 0.5 * (ratio < 1.0 ? ratio : 1.0) * 0.975;
  const double beta = 8.0;    // Kaiser beta ~ 80 dB stopband
  auto bessel_i0 = [](double x) {
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 64; ++k) {
      term *= (x / (2.0 * k)) * (x / (2.0 * k));
      sum += term;
      if (term < 1e-14 * sum) break;
    }
    return sum;
  };
  const double i0b = bessel_i0(beta);
  const double width = half_zeros / (2.0 * fc);  // support in input samples
  for (long j = 0; j < out_len; ++j) {
    const double center = j / ratio;
    const long lo = (long)ceil(center - width);
    const long hi = (long)floor(center + width);
    double acc = 0.0;
    for (long i = (lo < 0 ? 0 : lo); i <= hi && i < in_len; ++i) {
      const double t = i - center;            // input samples
      const double x = 2.0 * fc * t;          // sinc argument (zeros at ints)
      const double sinc = (fabs(x) < 1e-12) ? 1.0 : sin(kPi * x) / (kPi * x);
      const double u = x / half_zeros;        // window position in [-1, 1]
      if (u <= -1.0 || u >= 1.0) continue;
      const double win = bessel_i0(beta * sqrt(1.0 - u * u)) / i0b;
      acc += in[i] * (2.0 * fc * sinc * win);
    }
    (*out)[j] = (float)acc;
  }
}

}  // namespace

extern "C" {

int audioio_load_wav(const char* path, int target_sr, float* out,
                     long out_capacity, long* out_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int rc = parse_wav_header(f, &info);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  std::vector<double> mono;
  rc = decode_to_mono(f, info, &mono);
  fclose(f);
  if (rc != 0) return rc;
  std::vector<float> res;
  sinc_resample(mono.data(), (long)mono.size(), info.sample_rate,
                target_sr > 0 ? target_sr : info.sample_rate, &res);
  long n = (long)res.size();
  if (n > out_capacity) n = out_capacity;
  memcpy(out, res.data(), n * sizeof(float));
  *out_len = n;
  return 0;
}

int audioio_resample(const float* in, long in_len, int in_sr, int out_sr,
                     float* out, long out_capacity, long* out_len) {
  std::vector<double> tmp(in_len);
  for (long i = 0; i < in_len; ++i) tmp[i] = in[i];
  std::vector<float> res;
  sinc_resample(tmp.data(), in_len, in_sr, out_sr, &res);
  long n = (long)res.size();
  if (n > out_capacity) n = out_capacity;
  memcpy(out, res.data(), n * sizeof(float));
  *out_len = n;
  return 0;
}

}  // extern "C"
