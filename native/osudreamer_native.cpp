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

// ------------------------------------------------------------- slider fit
//
// Full MAP slider-curve selection (mirrors osu_dreamer_tpu/signal/fit/:
// select.py branch-and-bound over arc / single-bezier / greedy poly
// families, bezier_fit.py constrained Bernstein LSQ, arc_fit.py Kasa fit
// with renderability gates). The numpy path is the semantics oracle; this
// is the production path — the per-candidate LSQ solves are tiny (degree
// <= 7) so Python/numpy call overhead dominates there, ~50x this.
//
// Priors are NOT duplicated here: the caller passes the log-prior tables
// (signal/fit/prior.py) so both paths share exact constants.

namespace odnfit {

constexpr int MAX_CTRL = 8;    // max single-bezier control points
constexpr int MAX_SEG = 16;    // max poly segments
constexpr int POLY_CTRL = 4;   // poly-bezier per-segment control points

// arc gates — keep in sync with signal/fit/arc_fit.py
constexpr double MIN_ENDPOINT_DIST = 15.0;
constexpr double MAX_RADIUS = 320.0;
constexpr double MIN_SWEEP_RAD = 0.05;
constexpr double MAX_REVERSAL_FRAC = 0.25;

// ---- Gauss-Legendre nodes on [0,1] (orders 8 and 12 cover degrees <= 8:
// order = max(8, 4*ceil(sqrt(n_ctrl))) as in osu/paths.py)
struct GLTable {
  int order = 0;
  double t[16], w[16];
};

static void gl_compute(int order, GLTable& g) {
  g.order = order;
  for (int i = 0; i < order; i++) {
    double x = std::cos(M_PI * (i + 0.75) / (order + 0.5));
    double p1 = 0.0, p0 = 0.0, dp = 0.0;
    for (int it = 0; it < 100; it++) {
      p0 = 1.0;
      p1 = x;
      for (int k = 2; k <= order; k++) {
        const double p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k;
        p0 = p1;
        p1 = p2;
      }
      dp = order * (x * p1 - p0) / (x * x - 1.0);
      const double dx = p1 / dp;
      x -= dx;
      if (std::abs(dx) < 1e-15) break;
    }
    // refresh dp at the converged node for the weight
    p0 = 1.0;
    p1 = x;
    for (int k = 2; k <= order; k++) {
      const double p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k;
      p0 = p1;
      p1 = p2;
    }
    dp = order * (x * p1 - p0) / (x * x - 1.0);
    g.t[i] = 0.5 * (x + 1.0);
    g.w[i] = 2.0 / ((1.0 - x * x) * dp * dp);
  }
}

static const GLTable& gl_nodes(int order) {
  static GLTable g8, g12;
  if (order <= 8) {
    if (g8.order == 0) gl_compute(8, g8);
    return g8;
  }
  if (g12.order == 0) gl_compute(12, g12);
  return g12;
}

struct Curve {
  int n = 0;                  // control point count
  double pts[MAX_CTRL][2];    // control points
};

// arc length by GL quadrature of the hodograph (osu/paths.py:68-78)
static double curve_length(const Curve& c) {
  if (c.n < 2) return 0.0;
  const int order = std::max(8, (int)(4 * std::ceil(std::sqrt((double)c.n))));
  const GLTable& g = gl_nodes(order);
  // hodograph ctrl pts
  double h[MAX_CTRL][2];
  const int hn = c.n - 1;
  for (int i = 0; i < hn; i++) {
    h[i][0] = hn * (c.pts[i + 1][0] - c.pts[i][0]);
    h[i][1] = hn * (c.pts[i + 1][1] - c.pts[i][1]);
  }
  double acc = 0.0;
  for (int q = 0; q < g.order; q++) {
    const double t = g.t[q];
    double lv[MAX_CTRL][2];
    memcpy(lv, h, sizeof(double) * hn * 2);
    for (int lvl = hn; lvl > 1; lvl--) {
      for (int i = 0; i + 1 < lvl; i++) {
        lv[i][0] = (1.0 - t) * lv[i][0] + t * lv[i + 1][0];
        lv[i][1] = (1.0 - t) * lv[i][1] + t * lv[i + 1][1];
      }
    }
    acc += g.w[q] * std::sqrt(lv[0][0] * lv[0][0] + lv[0][1] * lv[0][1]);
  }
  return 0.5 * acc;
}

static double binom(int n, int k) {
  double r = 1.0;
  for (int i = 0; i < k; i++) r = r * (n - i) / (i + 1);
  return r;
}

// solve SPD system A (n x n) for m right-hand sides B (n x m), in place via
// Cholesky; singular pivots get a ridge retry (the numpy path's pinv
// fallback territory — degenerate spans outside the MAP search envelope)
static bool solve_spd(int n, double* A, double* B, int m) {
  for (int attempt = 0; attempt < 2; attempt++) {
    double L[MAX_CTRL * MAX_CTRL];
    memcpy(L, A, sizeof(double) * n * n);
    bool ok = true;
    for (int j = 0; j < n && ok; j++) {
      double d = L[j * n + j];
      for (int k = 0; k < j; k++) d -= L[j * n + k] * L[j * n + k];
      if (d <= 1e-300) {
        ok = false;
        break;
      }
      const double s = std::sqrt(d);
      L[j * n + j] = s;
      for (int i = j + 1; i < n; i++) {
        double v = L[i * n + j];
        for (int k = 0; k < j; k++) v -= L[i * n + k] * L[j * n + k];
        L[i * n + j] = v / s;
      }
    }
    if (!ok) {
      double tr = 0.0;
      for (int j = 0; j < n; j++) tr += A[j * n + j];
      const double ridge = std::max(tr, 1.0) * 1e-10;
      for (int j = 0; j < n; j++) A[j * n + j] += ridge;
      continue;
    }
    // forward/back substitution per RHS column
    for (int c = 0; c < m; c++) {
      double y[MAX_CTRL];
      for (int i = 0; i < n; i++) {
        double v = B[i * m + c];
        for (int k = 0; k < i; k++) v -= L[i * n + k] * y[k];
        y[i] = v / L[i * n + i];
      }
      for (int i = n - 1; i >= 0; i--) {
        double v = y[i];
        for (int k = i + 1; k < n; k++) v -= L[k * n + i] * B[k * m + c];
        B[i * m + c] = v / L[i * n + i];
      }
    }
    return true;
  }
  return false;
}

// constrained Bernstein LSQ over a span (bezier_fit.py:67-98). pts is the
// full (L,2) row-major array; the span is [lo, hi] inclusive. Returns the
// fitted curve, SSE, and the span-global index of the worst residual.
static void fit_span(const double* pts, int lo, int hi, int n_ctrl_req,
                     bool pin_start, bool pin_end, Curve& out, double* sse,
                     int* argmax_idx) {
  const int L = hi - lo + 1;
  const int n = std::min(n_ctrl_req, L);
  out.n = n;
  const int d = n - 1;

  // Bernstein basis on the uniform grid. Reused thread-local buffers (one
  // fit per call, spans re-fit thousands of times per map) and incremental
  // power chains — std::pow per entry was the hot spot
  static thread_local std::vector<double> T;
  T.resize((size_t)L * n);
  double cb[MAX_CTRL];
  for (int j = 0; j < n; j++) cb[j] = binom(d, j);
  for (int i = 0; i < L; i++) {
    const double t = L == 1 ? 0.0 : (double)i / (L - 1);
    const double v = 1.0 - t;
    double tp[MAX_CTRL], vp[MAX_CTRL];
    tp[0] = vp[0] = 1.0;
    for (int j = 1; j < n; j++) {
      tp[j] = tp[j - 1] * t;
      vp[j] = vp[j - 1] * v;
    }
    for (int j = 0; j < n; j++)
      T[(size_t)i * n + j] = cb[j] * tp[j] * vp[d - j];
  }

  bool pinned[MAX_CTRL] = {false};
  if (pin_start) pinned[0] = true;
  if (pin_end) pinned[n - 1] = true;
  int freeidx[MAX_CTRL], nf = 0;
  for (int j = 0; j < n; j++)
    if (!pinned[j]) freeidx[nf++] = j;

  double ctrl[MAX_CTRL][2];
  if (pin_start) {
    ctrl[0][0] = pts[2 * lo];
    ctrl[0][1] = pts[2 * lo + 1];
  }
  if (pin_end) {
    ctrl[n - 1][0] = pts[2 * hi];
    ctrl[n - 1][1] = pts[2 * hi + 1];
  }

  if (nf > 0) {
    // rhs = points - T_pinned @ ctrl_pinned
    static thread_local std::vector<double> rhs;
    rhs.resize((size_t)L * 2);
    for (int i = 0; i < L; i++) {
      double rx = pts[2 * (lo + i)], ry = pts[2 * (lo + i) + 1];
      for (int j = 0; j < n; j++)
        if (pinned[j]) {
          rx -= T[(size_t)i * n + j] * ctrl[j][0];
          ry -= T[(size_t)i * n + j] * ctrl[j][1];
        }
      rhs[2 * i] = rx;
      rhs[2 * i + 1] = ry;
    }
    // gram = Tf' Tf (nf x nf), B = Tf' rhs (nf x 2)
    double gram[MAX_CTRL * MAX_CTRL] = {0}, B[MAX_CTRL * 2] = {0};
    for (int i = 0; i < L; i++) {
      for (int a = 0; a < nf; a++) {
        const double ta = T[(size_t)i * n + freeidx[a]];
        for (int b = a; b < nf; b++)
          gram[a * nf + b] += ta * T[(size_t)i * n + freeidx[b]];
        B[a * 2] += ta * rhs[2 * i];
        B[a * 2 + 1] += ta * rhs[2 * i + 1];
      }
    }
    for (int a = 0; a < nf; a++)
      for (int b = 0; b < a; b++) gram[a * nf + b] = gram[b * nf + a];
    if (!solve_spd(nf, gram, B, 2)) {
      // fully degenerate: fall back to the data endpoints (a "fit" the MAP
      // cost will reject against any real candidate)
      for (int a = 0; a < nf; a++) {
        B[a * 2] = pts[2 * lo];
        B[a * 2 + 1] = pts[2 * lo + 1];
      }
    }
    for (int a = 0; a < nf; a++) {
      ctrl[freeidx[a]][0] = B[a * 2];
      ctrl[freeidx[a]][1] = B[a * 2 + 1];
    }
  }

  memcpy(out.pts, ctrl, sizeof(double) * n * 2);

  double s = 0.0, worst = -1.0;
  int wi = 0;
  for (int i = 0; i < L; i++) {
    double ex = -pts[2 * (lo + i)], ey = -pts[2 * (lo + i) + 1];
    for (int j = 0; j < n; j++) {
      ex += T[(size_t)i * n + j] * ctrl[j][0];
      ey += T[(size_t)i * n + j] * ctrl[j][1];
    }
    const double e = ex * ex + ey * ey;
    s += e;
    if (e > worst) {
      worst = e;
      wi = i;
    }
  }
  *sse = s;
  *argmax_idx = lo + wi;
}

// Kasa arc fit + gates (arc_fit.py). Returns true and fills sse/length/3
// control points when the span forms a renderable arc.
static bool fit_arc(const double* pts, int L, double* sse, double* length,
                    double ctrl[3][2]) {
  if (L < 3) return false;
  const double dx0 = pts[2 * (L - 1)] - pts[0],
               dy0 = pts[2 * (L - 1) + 1] - pts[1];
  if (std::sqrt(dx0 * dx0 + dy0 * dy0) < MIN_ENDPOINT_DIST) return false;

  // normal equations for design [2x, 2y, 1] target x^2+y^2 (3x3, symmetric)
  double A[9] = {0}, b[3] = {0};
  for (int i = 0; i < L; i++) {
    const double x = pts[2 * i], y = pts[2 * i + 1];
    const double row[3] = {2 * x, 2 * y, 1.0};
    const double t = x * x + y * y;
    for (int a = 0; a < 3; a++) {
      for (int c = a; c < 3; c++) A[a * 3 + c] += row[a] * row[c];
      b[a] += row[a] * t;
    }
  }
  for (int a = 0; a < 3; a++)
    for (int c = 0; c < a; c++) A[a * 3 + c] = A[c * 3 + a];
  // gaussian elimination w/ partial pivoting
  double M[12];
  for (int r = 0; r < 3; r++) {
    for (int c = 0; c < 3; c++) M[r * 4 + c] = A[r * 3 + c];
    M[r * 4 + 3] = b[r];
  }
  for (int col = 0; col < 3; col++) {
    int piv = col;
    for (int r = col + 1; r < 3; r++)
      if (std::abs(M[r * 4 + col]) > std::abs(M[piv * 4 + col])) piv = r;
    if (std::abs(M[piv * 4 + col]) < 1e-12) return false;  // collinear
    if (piv != col)
      for (int c = 0; c < 4; c++) std::swap(M[piv * 4 + c], M[col * 4 + c]);
    for (int r = 0; r < 3; r++) {
      if (r == col) continue;
      const double f = M[r * 4 + col] / M[col * 4 + col];
      for (int c = col; c < 4; c++) M[r * 4 + c] -= f * M[col * 4 + c];
    }
  }
  const double cx = M[3] / M[0], cy = M[7] / M[5], cc = M[11] / M[10];

  const double r_sq = cx * cx + cy * cy + cc;
  if (r_sq <= 0) return false;
  const double radius = std::sqrt(r_sq);
  if (radius > MAX_RADIUS) return false;

  // unwrapped angles
  std::vector<double> ang(L);
  double prev = std::atan2(pts[1] - cy, pts[0] - cx), offset = 0.0;
  ang[0] = prev;
  for (int i = 1; i < L; i++) {
    double a = std::atan2(pts[2 * i + 1] - cy, pts[2 * i] - cx);
    double d = a - prev;
    while (d > M_PI) d -= 2 * M_PI;
    while (d < -M_PI) d += 2 * M_PI;
    offset += d;
    ang[i] = ang[0] + offset;
    prev = a;
  }
  const double sweep = ang[L - 1] - ang[0];
  if (std::abs(sweep) < MIN_SWEEP_RAD) return false;
  if (std::abs(sweep) >= 2.0 * M_PI) return false;

  int reversals = 0;
  for (int i = 1; i < L; i++) {
    const double step = ang[i] - ang[i - 1];
    if (step != 0.0 && ((step > 0) != (sweep > 0))) reversals++;
  }
  if (reversals > (L - 1) * MAX_REVERSAL_FRAC) return false;

  double s = 0.0;
  for (int i = 0; i < L; i++) {
    const double ddx = pts[2 * i] - cx, ddy = pts[2 * i + 1] - cy;
    const double e = std::sqrt(ddx * ddx + ddy * ddy) - radius;
    s += e * e;
  }
  *sse = s;
  *length = std::abs(sweep) * radius;

  const double mid_angle = ang[0] + sweep / 2.0;
  ctrl[0][0] = pts[0];
  ctrl[0][1] = pts[1];
  ctrl[1][0] = cx + radius * std::cos(mid_angle);
  ctrl[1][1] = cy + radius * std::sin(mid_angle);
  ctrl[2][0] = pts[2 * (L - 1)];
  ctrl[2][1] = pts[2 * (L - 1) + 1];
  return true;
}

}  // namespace odnfit

extern "C" {

// MAP slider fit over one slide's cursor points (select.py:25-106).
//
//   pts            (L, 2) row-major float64 cursor points in osu!px
//   inv_two_var    1 / (2 * noise_scale^2)
//   lp_arc         log_prior_arc()
//   lp_single      log_prior_single_bezier(n) indexed by n, len >= max_single+1
//   max_single     MAX_SINGLE_BEZIER_CTRL (8)
//   lp_poly_line   log_prior_poly(m, all_lines=true) indexed by m, len >= max_seg+2
//   lp_poly_bez    log_prior_poly(m, all_lines=false), same indexing
//   max_seg        MAX_POLY_SEGMENTS (16)
//   out_type       'P' or 'B'
//   out_length     winner's pixel arc length (sum over segments)
//   out_ctrl       (max_seg * POLY_CTRL, 2) float64 capacity; UNROUNDED —
//                  the Python wrapper rounds (np.round half-to-even parity)
//   out_n_ctrl     control points written
//
// returns 0, or -1 for L < 2 (degenerate slider -> caller emits a circle)
int odn_fit_slider(const double* pts, int64_t L, double inv_two_var,
                   double lp_arc, const double* lp_single, int32_t max_single,
                   const double* lp_poly_line, const double* lp_poly_bez,
                   int32_t max_seg, char* out_type, double* out_length,
                   double* out_ctrl, int32_t* out_n_ctrl) {
  using namespace odnfit;
  if (L < 2) return -1;
  if (max_seg > MAX_SEG) max_seg = MAX_SEG;
  if (max_single > MAX_CTRL) max_single = MAX_CTRL;
  const int n = (int)L;

  double best_cost = HUGE_VAL;
  // winner state: arc (3 fixed ctrl + length) or segment list
  bool best_is_arc = false;
  double arc_len = 0.0, arc_ctrl[3][2];
  Curve best_segs[MAX_SEG];
  int best_n_segs = 0;

  auto consider = [&](double cost) {
    // NaN must never win nor poison pruning: mirror select.py's
    // `not (cost < best)` guard
    if (!(cost < best_cost)) return false;
    best_cost = cost;
    return true;
  };

  // 1. perfect arc
  {
    double sse, length, ctrl[3][2];
    if (fit_arc(pts, n, &sse, &length, ctrl) &&
        consider(sse * inv_two_var - lp_arc)) {
      best_is_arc = true;
      arc_len = length;
      memcpy(arc_ctrl, ctrl, sizeof(ctrl));
    }
  }

  // 2. single bezier, cheapest prior first (ties broken by lower degree,
  //    matching Python's sorted() on (-logp, n) tuples)
  {
    struct Cand {
      double penalty;
      int nc;
    } cands[MAX_CTRL + 1];
    int nc_max = std::min((int)max_single, n), m = 0;
    for (int k = 2; k <= nc_max; k++) cands[m++] = {-lp_single[k], k};
    std::sort(cands, cands + m, [](const Cand& a, const Cand& b) {
      return a.penalty != b.penalty ? a.penalty < b.penalty : a.nc < b.nc;
    });
    for (int i = 0; i < m; i++) {
      if (cands[i].penalty >= best_cost) break;
      Curve c;
      double sse;
      int am;
      fit_span(pts, 0, n - 1, cands[i].nc, false, false, c, &sse, &am);
      if (consider(sse * inv_two_var + cands[i].penalty)) {
        best_is_arc = false;
        best_segs[0] = c;
        best_n_segs = 1;
      }
    }
  }

  // 3. poly-line then poly-bezier, greedy worst-span splitting
  for (int family = 0; family < 2; family++) {
    const bool all_lines = family == 0;
    const double* lp = all_lines ? lp_poly_line : lp_poly_bez;
    const int n_ctrl = all_lines ? 2 : POLY_CTRL;
    if (-lp[2] >= best_cost) continue;

    int lo_arr[MAX_SEG], hi_arr[MAX_SEG];
    Curve segs[MAX_SEG];
    double sses[MAX_SEG];
    int cuts[MAX_SEG];
    int n_spans = 1;
    lo_arr[0] = 0;
    hi_arr[0] = n - 1;
    fit_span(pts, 0, n - 1, n_ctrl, false, false, segs[0], &sses[0], &cuts[0]);

    for (int iter = 0; iter < max_seg - 1; iter++) {
      // worst splittable span
      int k = -1;
      for (int s = 0; s < n_spans; s++)
        if (hi_arr[s] - lo_arr[s] >= 2 && (k < 0 || sses[s] > sses[k])) k = s;
      if (k < 0) break;
      const int lo = lo_arr[k], hi = hi_arr[k];
      int cut = cuts[k];
      if (!(lo < cut && cut < hi)) cut = (lo + hi) / 2;

      // insert: replace span k with (lo,cut) and (cut,hi)
      for (int s = n_spans; s > k + 1; s--) {
        lo_arr[s] = lo_arr[s - 1];
        hi_arr[s] = hi_arr[s - 1];
        segs[s] = segs[s - 1];
        sses[s] = sses[s - 1];
        cuts[s] = cuts[s - 1];
      }
      n_spans++;
      lo_arr[k] = lo;
      hi_arr[k] = cut;
      lo_arr[k + 1] = cut;
      hi_arr[k + 1] = hi;
      fit_span(pts, lo, cut, n_ctrl, lo != 0, cut != n - 1, segs[k], &sses[k],
               &cuts[k]);
      fit_span(pts, cut, hi, n_ctrl, cut != 0, hi != n - 1, segs[k + 1],
               &sses[k + 1], &cuts[k + 1]);

      double total_sse = 0.0;
      for (int s = 0; s < n_spans; s++) total_sse += sses[s];
      if (consider(total_sse * inv_two_var + (-lp[n_spans]))) {
        best_is_arc = false;
        best_n_segs = n_spans;
        memcpy(best_segs, segs, sizeof(Curve) * n_spans);
      }
      if (-lp[n_spans + 1] >= best_cost) break;
    }
  }

  // materialize the winner
  if (best_is_arc) {
    *out_type = 'P';
    *out_length = arc_len;
    memcpy(out_ctrl, arc_ctrl, sizeof(arc_ctrl));
    *out_n_ctrl = 3;
  } else if (best_n_segs > 0) {
    *out_type = 'B';
    double total = 0.0;
    int w = 0;
    for (int s = 0; s < best_n_segs; s++) {
      total += curve_length(best_segs[s]);
      for (int j = 0; j < best_segs[s].n; j++) {
        out_ctrl[2 * w] = best_segs[s].pts[j][0];
        out_ctrl[2 * w + 1] = best_segs[s].pts[j][1];
        w++;
      }
    }
    *out_length = total;
    *out_n_ctrl = w;
  } else {
    // nothing fit (cannot happen: single bezier always produces a candidate)
    *out_type = 'B';
    *out_length = 0.0;
    *out_n_ctrl = 0;
  }
  return 0;
}

}  // extern "C"
