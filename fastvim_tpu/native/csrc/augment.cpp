// Native (C++) host-side image pipeline for the TPU input path.
//
// The reference's native code is CUDA kernels (the TPU equivalents live in
// fastvim_tpu/ops/pallas); its *host* pipeline is torch DataLoader workers.
// Here the host pipeline's hot inner loops — bilinear random-resized-crop,
// flip, normalize, and multi-channel cell augmentation — run in C++ with a
// std::thread pool over the batch, feeding NHWC float32 buffers straight
// into device transfer. Exposed through a plain C ABI consumed via ctypes
// (no pybind11 dependency).
//
// Build: `make -C fastvim_tpu/native` (or the automatic build on import —
// see fastvim_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Rect {
  int x, y, w, h;
};

// xorshift-based per-sample RNG: deterministic given (seed, index)
static inline uint64_t mix(uint64_t z) {
  z += 0x9e3779b97f4a7c15ULL;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(mix(seed)) {}
  uint64_t next() { return s = mix(s); }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int randint(int lo, int hi) {  // inclusive lo, exclusive hi
    return lo + static_cast<int>(uniform() * (hi - lo));
  }
};

// Bilinear sample from HWC uint8 at fractional (fy, fx).
static inline float sample_bilinear(const uint8_t* img, int H, int W, int C,
                                    float fy, float fx, int c) {
  int y0 = static_cast<int>(fy);
  int x0 = static_cast<int>(fx);
  int y1 = std::min(y0 + 1, H - 1);
  int x1 = std::min(x0 + 1, W - 1);
  float wy = fy - y0, wx = fx - x0;
  float v00 = img[(y0 * W + x0) * C + c];
  float v01 = img[(y0 * W + x1) * C + c];
  float v10 = img[(y1 * W + x0) * C + c];
  float v11 = img[(y1 * W + x1) * C + c];
  return v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
         v10 * wy * (1 - wx) + v11 * wy * wx;
}

static Rect random_resized_crop_rect(Rng& rng, int H, int W, double lo,
                                     double hi) {
  double area = static_cast<double>(H) * W;
  for (int attempt = 0; attempt < 10; ++attempt) {
    double target = (lo + rng.uniform() * (hi - lo)) * area;
    double log_r = std::log(3.0 / 4.0) +
                   rng.uniform() * (std::log(4.0 / 3.0) - std::log(3.0 / 4.0));
    double ar = std::exp(log_r);
    int w = static_cast<int>(std::lround(std::sqrt(target * ar)));
    int h = static_cast<int>(std::lround(std::sqrt(target / ar)));
    if (w <= W && h <= H && w > 0 && h > 0) {
      int x = rng.randint(0, W - w + 1);
      int y = rng.randint(0, H - h + 1);
      return {x, y, w, h};
    }
  }
  int s = std::min(H, W);
  return {(W - s) / 2, (H - s) / 2, s, s};
}

static void process_one(const uint8_t* src, int H, int W, int C, float* dst,
                        int size, uint64_t seed, int training,
                        const float* mean, const float* std_,
                        float scale_lo, float scale_hi) {
  Rng rng(seed);
  Rect r;
  bool flip = false;
  if (training) {
    r = random_resized_crop_rect(rng, H, W, scale_lo, scale_hi);
    flip = rng.uniform() < 0.5;
  } else {
    // resize short side to size/0.875 then center crop
    int s = std::min(H, W);
    int crop = static_cast<int>(s * 0.875);
    r = {(W - crop) / 2, (H - crop) / 2, crop, crop};
  }
  float sy = static_cast<float>(r.h) / size;
  float sx = static_cast<float>(r.w) / size;
  for (int y = 0; y < size; ++y) {
    float fy = r.y + (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(H - 1)));
    for (int x = 0; x < size; ++x) {
      int xo = flip ? (size - 1 - x) : x;
      float fx = r.x + (xo + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(W - 1)));
      for (int c = 0; c < C; ++c) {
        float v = sample_bilinear(src, H, W, C, fy, fx, c) / 255.0f;
        dst[(y * size + x) * C + c] = (v - mean[c]) / std_[c];
      }
    }
  }
}

static void parallel_for(int n, int num_threads,
                         const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  int workers = std::min(n, num_threads);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Batch augment: src (B, H, W, C) uint8 → dst (B, size, size, C) float32.
// training: RandomResizedCrop(scale_lo..scale_hi)+flip; else center crop.
void fastvim_augment_batch(const uint8_t* src, int B, int H, int W, int C,
                           float* dst, int size, uint64_t seed, int training,
                           const float* mean, const float* std_,
                           float scale_lo, float scale_hi,
                           int num_threads) {
  const size_t in_stride = static_cast<size_t>(H) * W * C;
  const size_t out_stride = static_cast<size_t>(size) * size * C;
  parallel_for(B, num_threads, [&](int i) {
    process_one(src + i * in_stride, H, W, C, dst + i * out_stride, size,
                seed * 1000003ULL + i, training, mean, std_, scale_lo,
                scale_hi);
  });
}

// Multi-channel float augment (cells): flip/pad-crop/normalize in-place
// pipeline: src (B, H, W, C) float32 → dst same shape.
void fastvim_cell_augment_batch(const float* src, int B, int H, int W, int C,
                                float* dst, uint64_t seed, int training,
                                const float* mean, const float* std_,
                                int num_threads) {
  const size_t stride = static_cast<size_t>(H) * W * C;
  parallel_for(B, num_threads, [&](int i) {
    Rng rng(seed * 1000003ULL + i);
    const float* s = src + i * stride;
    float* d = dst + i * stride;
    bool fh = training && rng.uniform() < 0.5;
    bool fv = training && rng.uniform() < 0.5;
    int pad = training ? H / 16 : 0;
    int oy = pad ? rng.randint(-pad, pad + 1) : 0;
    int ox = pad ? rng.randint(-pad, pad + 1) : 0;
    for (int y = 0; y < H; ++y) {
      int sy = y + oy;
      sy = sy < 0 ? -sy : (sy >= H ? 2 * H - sy - 2 : sy);  // reflect
      int ry = fv ? H - 1 - sy : sy;
      for (int x = 0; x < W; ++x) {
        int sx = x + ox;
        sx = sx < 0 ? -sx : (sx >= W ? 2 * W - sx - 2 : sx);
        int rx = fh ? W - 1 - sx : sx;
        for (int c = 0; c < C; ++c) {
          float v = s[(ry * W + rx) * C + c];
          d[(y * W + x) * C + c] =
              mean ? (v - mean[c]) / std_[c] : v;
        }
      }
    }
  });
}

int fastvim_native_version() { return 1; }

}  // extern "C"
