// osu!dreamer-tpu native runtime: host-side hot paths as first-party C++.
//
// The reference delegates these to third-party native crates/libs
// (torchcodec/C++ for audio decode, resonators/Rust for the IIR bank,
// rosu-pp/Rust for star rating — SURVEY.md §2.9). Here they are first-party:
//
//   odn_wav_decode    RIFF/WAVE parse -> interleaved float32
//   odn_resample      polyphase windowed-sinc (Kaiser) sample-rate conversion
//   odn_resonate      72-bin complex one-pole resonator bank, hopped output
//                     (bit-parity ground truth for the TPU matmul+scan
//                      formulation in audio/spectrogram.py)
//   odn_star_rating   classic osu!std two-skill strain star rating
//
// C ABI only; bound from Python with ctypes (osu_dreamer_tpu/native).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV/RIFF

// returns 0 on success; fills out (caller allocates via odn_alloc semantics:
// out buffer must hold frame capacity; call odn_wav_info first)
struct OdnWavInfo {
  int32_t channels;
  int32_t sample_rate;
  int64_t n_frames;  // frames = samples per channel
};

static int find_chunks(const uint8_t* data, int64_t len, const uint8_t** fmt,
                       uint32_t* fmt_len, const uint8_t** payload,
                       uint32_t* payload_len) {
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  *fmt = nullptr;
  *payload = nullptr;
  while (pos + 8 <= len) {
    const uint8_t* id = data + pos;
    uint32_t chunk_len;
    memcpy(&chunk_len, data + pos + 4, 4);
    if (pos + 8 + (int64_t)chunk_len > len) chunk_len = (uint32_t)(len - pos - 8);
    if (memcmp(id, "fmt ", 4) == 0) {
      *fmt = data + pos + 8;
      *fmt_len = chunk_len;
    } else if (memcmp(id, "data", 4) == 0) {
      *payload = data + pos + 8;
      *payload_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  return (*fmt && *payload) ? 0 : -2;
}

int odn_wav_info(const uint8_t* data, int64_t len, OdnWavInfo* info) {
  const uint8_t *fmt, *payload;
  uint32_t fmt_len, payload_len;
  int rc = find_chunks(data, len, &fmt, &fmt_len, &payload, &payload_len);
  if (rc != 0) return rc;
  if (fmt_len < 16) return -3;
  uint16_t channels, bits;
  uint32_t rate;
  memcpy(&channels, fmt + 2, 2);
  memcpy(&rate, fmt + 4, 4);
  memcpy(&bits, fmt + 14, 2);
  // sub-byte depths (e.g. 4-bit ADPCM) would make the bytes-per-frame
  // integer division ZERO -> SIGFPE killing the whole process
  if (channels == 0 || bits < 8 || bits % 8 != 0) return -4;
  info->channels = channels;
  info->sample_rate = (int32_t)rate;
  info->n_frames = (int64_t)payload_len / (channels * (bits / 8));
  return 0;
}

// out: n_frames * channels floats, interleaved
int odn_wav_decode(const uint8_t* data, int64_t len, float* out) {
  const uint8_t *fmt, *payload;
  uint32_t fmt_len, payload_len;
  int rc = find_chunks(data, len, &fmt, &fmt_len, &payload, &payload_len);
  if (rc != 0) return rc;
  // validate here too: this is an exported C-ABI entry — callers are not
  // obligated to run odn_wav_info first
  if (fmt_len < 16) return -3;
  uint16_t format, channels, bits;
  memcpy(&format, fmt, 2);
  memcpy(&channels, fmt + 2, 2);
  memcpy(&bits, fmt + 14, 2);
  if (channels == 0 || bits < 8 || bits % 8 != 0) return -4;
  if (format == 0xFFFE) {
    // WAVE_FORMAT_EXTENSIBLE: the REAL format code is the SubFormat GUID's
    // leading u16 at fmt body offset 24 (16 std + cbSize 2 + valid-bits 2 +
    // channel-mask 4) — extensible IEEE-float files would otherwise decode
    // through the int-PCM path as full-scale noise (matches decode.py)
    if (fmt_len >= 26) {
      memcpy(&format, fmt + 24, 2);
    } else {
      format = 1;  // malformed extensible header: assume PCM
    }
  }

  int64_t n_samples = (int64_t)payload_len / (bits / 8);
  n_samples -= n_samples % channels;

  if (format == 3 && bits == 32) {
    memcpy(out, payload, n_samples * 4);
  } else if (format == 3 && bits == 64) {
    const double* src = (const double*)payload;
    for (int64_t i = 0; i < n_samples; i++) out[i] = (float)src[i];
  } else if (format == 1 && bits == 16) {
    const int16_t* src = (const int16_t*)payload;
    for (int64_t i = 0; i < n_samples; i++) out[i] = src[i] / 32768.0f;
  } else if (format == 1 && bits == 8) {
    for (int64_t i = 0; i < n_samples; i++) out[i] = (payload[i] - 128) / 128.0f;
  } else if (format == 1 && bits == 24) {
    for (int64_t i = 0; i < n_samples; i++) {
      int32_t v = payload[i * 3] | (payload[i * 3 + 1] << 8) |
                  (payload[i * 3 + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      out[i] = v / 8388608.0f;
    }
  } else if (format == 1 && bits == 32) {
    const int32_t* src = (const int32_t*)payload;
    for (int64_t i = 0; i < n_samples; i++) out[i] = src[i] / 2147483648.0f;
  } else {
    return -5;
  }
  return 0;
}

// -------------------------------------------------------------- resampling

static double bessel_i0(double x) {
  // series expansion; converges fast for the Kaiser beta range
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; k++) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

int64_t odn_resample_out_len(int64_t n_in, int32_t rate_in, int32_t rate_out) {
  return (n_in * (int64_t)rate_out + rate_in - 1) / rate_in;
}

// windowed-sinc polyphase resampling, Kaiser window (beta 8.6, ~-90 dB
// stopband), 32 taps per phase at the lower of the two rates
int odn_resample(const float* in, int64_t n_in, int32_t rate_in,
                 int32_t rate_out, float* out) {
  if (rate_in == rate_out) {
    memcpy(out, in, n_in * 4);
    return 0;
  }
  const double beta = 8.6;
  const double cutoff = 0.95 * 0.5 * std::min(rate_in, rate_out) / (double)rate_in;
  const double i0b = bessel_i0(beta);

  int64_t n_out = odn_resample_out_len(n_in, rate_in, rate_out);
  const double step = (double)rate_in / rate_out;
  // 16 taps per phase at the LOWER of the two rates: when downsampling the
  // anti-alias sinc stretches by 1/(2*cutoff) ~ step, so the window
  // half-width must stretch with it or the kernel truncates after a few
  // sidelobes and aliasing leaks into the band (the scipy fallback's
  // resample_poly sizes its filter the same way)
  const int64_t taps_half =
      (int64_t)std::ceil(16.0 * std::max(1.0, step));
  const double scale = 2.0 * cutoff;

  for (int64_t o = 0; o < n_out; o++) {
    const double center = o * step;
    const int64_t lo = (int64_t)std::ceil(center) - taps_half;
    const int64_t hi = lo + 2 * taps_half;
    double acc = 0.0, wsum = 0.0;
    for (int64_t i = lo; i < hi; i++) {
      const double t = (i - center);
      const double x = t / (double)taps_half;
      if (x <= -1.0 || x >= 1.0) continue;
      const double window = bessel_i0(beta * std::sqrt(1.0 - x * x)) / i0b;
      const double arg = 2.0 * cutoff * t;
      const double sinc = arg == 0.0 ? 1.0 : std::sin(M_PI * arg) / (M_PI * arg);
      const double w = scale * sinc * window;
      wsum += w;
      const int64_t idx = std::clamp(i, (int64_t)0, n_in - 1);
      acc += w * in[idx];
    }
    // kernel sums to H(0)=1; renormalizing by the truncated-window sum keeps
    // unity DC gain at the edges
    out[o] = (float)(wsum > 1e-9 ? acc / wsum : acc);
  }
  return 0;
}

// ---------------------------------------------------------- resonator bank

// complex one-pole bank: y[n] = alpha*x[n] + (1-alpha)*e^{iw} y[n-1];
// emits the state after each hop. out_re/out_im: (n_frames, n_bins).
int odn_resonate(const float* wave, int64_t n, const float* freqs,
                 const float* alphas, int32_t n_bins, int32_t hop,
                 int32_t sample_rate, float* out_re, float* out_im) {
  std::vector<double> br(n_bins), bi(n_bins), yr(n_bins, 0.0), yi(n_bins, 0.0),
      a(n_bins);
  for (int k = 0; k < n_bins; k++) {
    const double w = 2.0 * M_PI * freqs[k] / sample_rate;
    const double r = 1.0 - alphas[k];
    br[k] = r * std::cos(w);
    bi[k] = r * std::sin(w);
    a[k] = alphas[k];
  }
  const int64_t n_frames = (n + hop - 1) / hop;
  for (int64_t f = 0; f < n_frames; f++) {
    const int64_t end = std::min((f + 1) * (int64_t)hop, n);
    for (int64_t i = f * hop; i < end; i++) {
      const double x = wave[i];
      for (int k = 0; k < n_bins; k++) {
        const double nr = a[k] * x + br[k] * yr[k] - bi[k] * yi[k];
        const double ni = br[k] * yi[k] + bi[k] * yr[k];
        yr[k] = nr;
        yi[k] = ni;
      }
    }
    // zero-padded tail of the final frame advances the phase only
    for (int64_t i = end; i < (f + 1) * (int64_t)hop; i++) {
      for (int k = 0; k < n_bins; k++) {
        const double nr = br[k] * yr[k] - bi[k] * yi[k];
        const double ni = br[k] * yi[k] + bi[k] * yr[k];
        yr[k] = nr;
        yi[k] = ni;
      }
    }
    for (int k = 0; k < n_bins; k++) {
      out_re[f * n_bins + k] = (float)yr[k];
      out_im[f * n_bins + k] = (float)yi[k];
    }
  }
  return 0;
}

// -------------------------------------------------------------- difficulty

// classic two-skill strain model; mirrors osu_dreamer_tpu/osu/difficulty.py
static double speed_weight(double d) {
  if (d > 125.0) return 2.5;
  if (d > 110.0) return 1.6 + 0.9 * (d - 110.0) / 15.0;
  if (d > 90.0) return 1.2 + 0.4 * (d - 90.0) / 20.0;
  if (d > 45.0) return 0.95 + 0.25 * (d - 45.0) / 45.0;
  return 0.95;
}

static double skill_difficulty(const std::vector<double>& times,
                               const std::vector<double>& strains,
                               double decay) {
  if (times.empty()) return 0.0;
  std::vector<double> peaks;
  double section_end = 400.0 * std::ceil(std::max(times[0], 1.0) / 400.0);
  double current = 0.0, running = 0.0;
  for (size_t i = 0; i < times.size(); i++) {
    while (times[i] > section_end) {
      peaks.push_back(current);
      const double prev_t = times[i == 0 ? 0 : i - 1];
      current = running * std::pow(decay, (section_end - prev_t) / 1000.0);
      section_end += 400.0;
    }
    running = strains[i];
    current = std::max(current, running);
  }
  peaks.push_back(current);
  std::sort(peaks.rbegin(), peaks.rend());
  double total = 0.0, weight = 1.0;
  for (double p : peaks) {
    total += p * weight;
    weight *= 0.9;
  }
  return total;
}

double odn_star_rating(const double* times, const double* xs, const double* ys,
                       int64_t n, double cs) {
  if (n < 2) return 0.0;
  const double radius = 32.0 * (1.0 - 0.7 * (cs - 5.0) / 5.0);
  double scale = 52.0 / radius;
  if (radius < 30.0) scale *= 1.0 + std::min(30.0 - radius, 5.0) / 50.0;

  // the classic model clamps ONLY the strain-increment divisor to 50 ms;
  // decay runs on the raw time delta (stacked/0 ms objects decay ~nothing)
  std::vector<double> raw_dts(n - 1), dts(n - 1), dists(n - 1);
  for (int64_t i = 0; i + 1 < n; i++) {
    raw_dts[i] = std::max(times[i + 1] - times[i], 0.0);
    dts[i] = std::max(raw_dts[i], 50.0);
    const double dx = (xs[i + 1] - xs[i]) * scale;
    const double dy = (ys[i + 1] - ys[i]) * scale;
    dists[i] = std::sqrt(dx * dx + dy * dy);
  }

  const double decays[2] = {0.3, 0.15};          // speed, aim
  const double scalings[2] = {1400.0, 26.25};
  double stars[2];
  for (int skill = 0; skill < 2; skill++) {
    std::vector<double> strains(n - 1), ts(n - 1);
    double prev = 0.0;
    for (int64_t i = 0; i + 1 < n; i++) {
      const double w =
          skill == 0 ? speed_weight(dists[i]) : std::pow(dists[i], 0.99);
      const double inc = w * scalings[skill] / dts[i];
      prev = prev * std::pow(decays[skill], raw_dts[i] / 1000.0) + inc;
      strains[i] = prev;
      ts[i] = times[i + 1];
    }
    stars[skill] =
        std::sqrt(skill_difficulty(ts, strains, decays[skill])) * 0.0675;
  }
  return stars[0] + stars[1] + std::abs(stars[0] - stars[1]) * 0.5;
}

}  // extern "C"
