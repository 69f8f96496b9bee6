// Native data-path engine: multithreaded camera ray generation + fisheye
// undistortion.  The TPU-native analogue of the reference's native-speed
// data path (its ray precompute runs as torch CUDA tensor math at load time;
// nerf/provider.py:344-467): here a C++ engine fills the device-upload
// buffers so large multi-view datasets load at memory bandwidth instead of
// Python speed.  Exposed via ctypes (customnerf_tpu/utils/native.py).
//
// Build: g++ -O3 -shared -fPIC -pthread -o libdataio.so dataio.cpp

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// Newton iteration inverse of the OpenCV radial+tangential model
// (same math as customnerf_tpu/data/camera.py::radial_and_tangential_undistort).
void undistort_fisheye(float* coords, const float* k /*6*/, int64_t m,
                       int iters) {
  const float k1 = k[0], k2 = k[1], k3 = k[2], k4 = k[3], p1 = k[4], p2 = k[5];
  for (int64_t i = 0; i < m; ++i) {
    const float xd = coords[2 * i], yd = coords[2 * i + 1];
    float x = xd, y = yd;
    for (int it = 0; it < iters; ++it) {
      const float r2 = x * x + y * y;
      const float d = 1.f + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)));
      const float fx = d * x + 2 * p1 * x * y + p2 * (r2 + 2 * x * x) - xd;
      const float fy = d * y + 2 * p2 * x * y + p1 * (r2 + 2 * y * y) - yd;
      const float dr = k1 + r2 * (2 * k2 + r2 * (3 * k3 + r2 * 4 * k4));
      const float fxx = d + 2 * x * x * dr + 2 * p1 * y + 6 * p2 * x;
      const float fxy = 2 * x * y * dr + 2 * p1 * x + 2 * p2 * y;
      const float fyy = d + 2 * y * y * dr + 2 * p2 * x + 6 * p1 * y;
      float det = fxx * fyy - fxy * fxy;
      if (std::fabs(det) < 1e-3f) det = 1.f;
      x -= (fx * fyy - fy * fxy) / det;
      y -= (fy * fxx - fx * fxy) / det;
    }
    coords[2 * i] = x;
    coords[2 * i + 1] = y;
  }
}

namespace {

// one pose worth of pinhole rays, output [H, W, 3] (row-major H-major),
// reproducing the nerfstudio provider convention: pixel grid built x-major
// over W then transposed (provider math — see data/nerfstudio.py).
void rays_for_pose(const float* c2w /*3x4 row-major*/, int H, int W, float fx,
                   float fy, float cx, float cy, float lvl, float* origins,
                   float* dirs) {
  const float ox = c2w[3], oy = c2w[7], oz = c2w[11];
  for (int yi = 0; yi < H; ++yi) {
    // ty = linspace(0, H*lvl-1, H) + 0.5
    const float py = (H > 1 ? yi * (H * lvl - 1.f) / (H - 1) : 0.f) + 0.5f;
    for (int xi = 0; xi < W; ++xi) {
      const float px = (W > 1 ? xi * (W * lvl - 1.f) / (W - 1) : 0.f) + 0.5f;
      const float u = (px - cx) / fx;
      const float v = -(py - cy) / fy;
      // world dir = R @ [u, v, -1]
      float dx = c2w[0] * u + c2w[1] * v - c2w[2];
      float dy = c2w[4] * u + c2w[5] * v - c2w[6];
      float dz = c2w[8] * u + c2w[9] * v - c2w[10];
      const float inv = 1.f / std::sqrt(dx * dx + dy * dy + dz * dz);
      const int64_t o = ((int64_t)yi * W + xi) * 3;
      dirs[o] = dx * inv;
      dirs[o + 1] = dy * inv;
      dirs[o + 2] = dz * inv;
      origins[o] = ox;
      origins[o + 1] = oy;
      origins[o + 2] = oz;
    }
  }
}

}  // namespace

// Batch ray generation over n_poses, parallelised across poses.
void generate_rays_pinhole(const float* c2w /*n,3,4*/, int n_poses, int H,
                           int W, float fx, float fy, float cx, float cy,
                           float lvl, float* origins /*n,H,W,3*/,
                           float* dirs, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  const int64_t stride = (int64_t)H * W * 3;
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n_poses; i += n_threads) {
        rays_for_pose(c2w + (int64_t)i * 12, H, W, fx, fy, cx, cy, lvl,
                      origins + i * stride, dirs + i * stride);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// uint8 HWC image → float32 [0,1] with optional 1/256 scaling (the
// reference divides by 256, provider.py:267) — bulk conversion off the
// Python heap.
void images_to_float(const uint8_t* src, float* dst, int64_t n,
                     float scale) {
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * scale;
}

}  // extern "C"
