// Native host-side voxel preprocessing for the data layer.
//
// The reference's native code is CUDA compute kernels; its host data path
// is pure python. Here the host preprocessing hot loops (density->alpha
// activation, uint8 normalization, pad-copy into fixed-shape batches) are
// C++ with OpenMP-free std::thread parallelism, bound via ctypes
// (instance_nerf_tpu/data/native.py). Falls back to numpy when the
// toolchain is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libvoxel_ops.so voxel_ops.cpp -lpthread

#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(size_t n, const std::function<void(size_t, size_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  size_t nthreads = hw ? hw : 1;
  if (n < (1u << 16) || nthreads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  size_t chunk = (n + nthreads - 1) / nthreads;
  for (size_t t = 0; t < nthreads; ++t) {
    size_t lo = t * chunk;
    size_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// alpha = clip(1 - exp(-exp(sigma)/100), 0, 1)   (instant-ngp convention)
void density_to_alpha_ngp(const float* sigma, float* alpha, size_t n) {
  parallel_for(n, [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) {
      float a = 1.0f - std::exp(-std::exp(sigma[i]) / 100.0f);
      alpha[i] = a < 0.0f ? 0.0f : (a > 1.0f ? 1.0f : a);
    }
  });
}

// alpha = clip(1 - exp(-relu(sigma)/100), 0, 1)  (dense-depth-priors)
void density_to_alpha_ddp(const float* sigma, float* alpha, size_t n) {
  parallel_for(n, [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) {
      float s = sigma[i] > 0.0f ? sigma[i] : 0.0f;
      float a = 1.0f - std::exp(-s / 100.0f);
      alpha[i] = a < 0.0f ? 0.0f : (a > 1.0f ? 1.0f : a);
    }
  });
}

// uint8 -> float32 / 255
void u8_to_f32(const uint8_t* src, float* dst, size_t n) {
  parallel_for(n, [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) dst[i] = src[i] * (1.0f / 255.0f);
  });
}

// copy (w, l, h, c) row-major into a zeroed (pw, pl, ph, c) buffer
void pad_copy_4d(const float* src, float* dst, int64_t w, int64_t l,
                 int64_t h, int64_t c, int64_t pw, int64_t pl, int64_t ph) {
  (void)pw;
  size_t row = static_cast<size_t>(h) * c * sizeof(float);
  parallel_for(static_cast<size_t>(w), [&](size_t lo, size_t hi) {
    for (size_t x = lo; x < hi; ++x) {
      for (int64_t y = 0; y < l; ++y) {
        const float* s = src + ((x * l) + y) * h * c;
        float* d = dst + ((x * pl) + y) * ph * c;
        std::memcpy(d, s, row);
      }
    }
  });
}

// per-instance binary masks from an int instance-id grid:
// out (k, n) uint8 with out[j][i] = (grid[i] == ids[j])
void instance_masks(const int64_t* grid, const int64_t* ids, uint8_t* out,
                    size_t n, size_t k) {
  parallel_for(n, [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) {
      int64_t v = grid[i];
      for (size_t j = 0; j < k; ++j) out[j * n + i] = (v == ids[j]) ? 1 : 0;
    }
  });
}

}  // extern "C"
