// camels_prep — multithreaded host-side data preparation for the TPU input
// pipeline.
//
// The training pipeline's host prep (reference: train_diffusion_paper.py
// :254-262) runs four full passes over a ~4 GB map stack (shift-positive,
// divide-by-max, log10, global min-max) followed by a bilinear 256->64
// downsample.  numpy executes these single-threaded; this library does the
// reductions and transforms with a thread pool and fuses the normalize
// passes, cutting job startup time on many-core TPU-VM hosts.
//
// Exposed C ABI (see camels_diffusion_model_tpu/data/native_prep.py):
//   camels_minmax       — global min/max reduction
//   camels_normalize    — fused (x - shift) * scale -> log10 -> minmax [0,1]
//   camels_resize_bilinear — torch-semantics (align_corners=False) resize
//
// Build: make -C native   (produces libcamels_prep.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

template <typename F>
void parallel_for(int64_t n, F&& fn) {
  const int nthreads = std::min<int64_t>(hardware_threads(), std::max<int64_t>(n, 1));
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  const int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = std::min<int64_t>(begin + chunk, n);
    if (begin >= end) break;
    pool.emplace_back([begin, end, &fn] { fn(begin, end); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Global min/max of a float32 array (parallel reduction).
void camels_minmax(const float* data, int64_t n, float* out_min, float* out_max) {
  const int nthreads = hardware_threads();
  std::vector<double> mins(nthreads, HUGE_VAL), maxs(nthreads, -HUGE_VAL);
  std::atomic<int> next{0};
  parallel_for(n, [&](int64_t begin, int64_t end) {
    const int slot = next.fetch_add(1);
    double lo = HUGE_VAL, hi = -HUGE_VAL;
    for (int64_t i = begin; i < end; ++i) {
      const double v = data[i];
      lo = std::min(lo, v);
      hi = std::max(hi, v);
    }
    mins[slot] = std::min(mins[slot], lo);
    maxs[slot] = std::max(maxs[slot], hi);
  });
  double lo = HUGE_VAL, hi = -HUGE_VAL;
  for (int t = 0; t < nthreads; ++t) {
    lo = std::min(lo, mins[t]);
    hi = std::max(hi, maxs[t]);
  }
  *out_min = static_cast<float>(lo);
  *out_max = static_cast<float>(hi);
}

// Fused "code"-style normalization (train_diffusion_paper.py:254-260):
//   y = log10((x + shift) / max_val); out = (y - log_min)/(log_max - log_min)
// Two fused passes instead of numpy's four unfused ones; float64 accumulation
// to match numpy's default dtype semantics.
void camels_normalize(const float* in, float* out, int64_t n, double shift,
                      double max_val) {
  const int nthreads = hardware_threads();
  std::vector<double> mins(nthreads, HUGE_VAL), maxs(nthreads, -HUGE_VAL);
  std::atomic<int> next{0};
  // Pass 1: y = log10((x + shift)/max), track global y-min/max.
  parallel_for(n, [&](int64_t begin, int64_t end) {
    const int slot = next.fetch_add(1);
    double lo = HUGE_VAL, hi = -HUGE_VAL;
    for (int64_t i = begin; i < end; ++i) {
      const double y = std::log10((static_cast<double>(in[i]) + shift) / max_val);
      out[i] = static_cast<float>(y);
      lo = std::min(lo, y);
      hi = std::max(hi, y);
    }
    mins[slot] = std::min(mins[slot], lo);
    maxs[slot] = std::max(maxs[slot], hi);
  });
  double lo = HUGE_VAL, hi = -HUGE_VAL;
  for (int t = 0; t < nthreads; ++t) {
    lo = std::min(lo, mins[t]);
    hi = std::max(hi, maxs[t]);
  }
  const double scale = 1.0 / (hi - lo);
  // Pass 2: min-max to [0, 1].
  parallel_for(n, [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      out[i] = static_cast<float>((static_cast<double>(out[i]) - lo) * scale);
    }
  });
}

// Bilinear resize of a (B, H, W) stack to (B, OH, OW), exact torch
// F.interpolate(mode='bilinear', align_corners=False) semantics
// (train_diffusion_paper.py:262).  Parallel over images.
void camels_resize_bilinear(const float* in, float* out, int64_t b, int64_t h,
                            int64_t w, int64_t oh, int64_t ow) {
  std::vector<int64_t> y0(oh), y1(oh);
  std::vector<float> wy(oh);
  std::vector<int64_t> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  const double sy = static_cast<double>(h) / oh;
  const double sx = static_cast<double>(w) / ow;
  for (int64_t i = 0; i < oh; ++i) {
    const double src = (i + 0.5) * sy - 0.5;
    const double f = std::floor(src);
    y0[i] = std::min<int64_t>(std::max<int64_t>(static_cast<int64_t>(f), 0), h - 1);
    y1[i] = std::min<int64_t>(std::max<int64_t>(static_cast<int64_t>(f) + 1, 0), h - 1);
    wy[i] = static_cast<float>(src - f);
  }
  for (int64_t j = 0; j < ow; ++j) {
    const double src = (j + 0.5) * sx - 0.5;
    const double f = std::floor(src);
    x0[j] = std::min<int64_t>(std::max<int64_t>(static_cast<int64_t>(f), 0), w - 1);
    x1[j] = std::min<int64_t>(std::max<int64_t>(static_cast<int64_t>(f) + 1, 0), w - 1);
    wx[j] = static_cast<float>(src - f);
  }
  parallel_for(b, [&](int64_t begin, int64_t end) {
    for (int64_t img = begin; img < end; ++img) {
      const float* src = in + img * h * w;
      float* dst = out + img * oh * ow;
      for (int64_t i = 0; i < oh; ++i) {
        const float* r0 = src + y0[i] * w;
        const float* r1 = src + y1[i] * w;
        const float fy = wy[i];
        for (int64_t j = 0; j < ow; ++j) {
          const float top = r0[x0[j]] * (1.0f - wx[j]) + r0[x1[j]] * wx[j];
          const float bot = r1[x0[j]] * (1.0f - wx[j]) + r1[x1[j]] * wx[j];
          dst[i * ow + j] = top * (1.0f - fy) + bot * fy;
        }
      }
    }
  });
}

}  // extern "C"
