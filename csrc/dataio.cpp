// Native data-path engine: multithreaded camera ray generation, fisheye
// undistortion, and JPEG/PNG image decode + area resize.  The TPU-native
// analogue of the reference's native-speed data path (its ray precompute
// runs as torch CUDA tensor math at load time; nerf/provider.py:344-467):
// here a C++ engine fills the device-upload buffers so large multi-view
// datasets load at memory bandwidth instead of Python speed.  Exposed via
// ctypes (customnerf_tpu/utils/native.py).
//
// Build: g++ -O3 -shared -fPIC -pthread -o libdataio.so dataio.cpp \
//            -ljpeg -lpng   (falls back to a decode-less build when the
//                            image libraries are missing — see native.py)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#ifdef HAVE_IMAGE_LIBS
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#include <png.h>
#endif

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

// ---------------------------------------------------------------- decode
// JPEG/PNG decode via the system codecs (the same libjpeg/libpng cv2 links)
// plus a fractional-coverage box-filter resize (cv2 INTER_AREA semantics),
// batch-parallel across images.  1 = this build has codecs, 0 = ray-only.
int has_image_codecs(void) {
#ifdef HAVE_IMAGE_LIBS
  return 1;
#else
  return 0;
#endif
}

#ifdef HAVE_IMAGE_LIBS
namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

bool is_jpeg(const uint8_t* d, int64_t n) {
  return n > 3 && d[0] == 0xFF && d[1] == 0xD8;
}
bool is_png(const uint8_t* d, int64_t n) {
  return n > 8 && png_sig_cmp(const_cast<png_bytep>(d), 0, 8) == 0;
}

bool decode_jpeg_rgb(const uint8_t* data, int64_t n, std::vector<uint8_t>& out,
                     int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(n));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out.resize(static_cast<size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  int64_t size;
  int64_t off;
};

void png_read_cb(png_structp png, png_bytep dst, png_size_t len) {
  auto* st = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->off + static_cast<int64_t>(len) > st->size) {
    png_error(png, "png: read past end");
  }
  std::memcpy(dst, st->data + st->off, len);
  st->off += len;
}

// decodes to RGB8 (gray expanded, alpha stripped, 16-bit downshifted)
bool decode_png_rgb(const uint8_t* data, int64_t n, std::vector<uint8_t>& out,
                    int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{data, n, 0};
  png_set_read_fn(png, &st, png_read_cb);
  png_read_info(png, info);
  png_set_expand(png);          // palette/low-bit gray → 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  out.resize(static_cast<size_t>(*h) * *w * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = out.data() + static_cast<size_t>(y) * *w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// fractional-coverage box filter (cv2 INTER_AREA downscale semantics):
// dst pixel (y, x) averages src over [y·sy, (y+1)·sy) × [x·sx, (x+1)·sx)
// with partial rows/cols weighted by coverage.  Output float in [0, 1]
// (or grayscale mean when gray=1).
void resize_area(const uint8_t* src, int sh, int sw, float* dst, int dh,
                 int dw, int gray, float scale) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  const int dc = gray ? 1 : 3;
  for (int y = 0; y < dh; ++y) {
    const double y0 = y * sy, y1 = (y + 1) * sy;
    const int iy0 = static_cast<int>(y0);
    const int iy1 = std::min(static_cast<int>(std::ceil(y1)), sh);
    for (int x = 0; x < dw; ++x) {
      const double x0 = x * sx, x1 = (x + 1) * sx;
      const int ix0 = static_cast<int>(x0);
      const int ix1 = std::min(static_cast<int>(std::ceil(x1)), sw);
      double acc[3] = {0, 0, 0};
      double area = 0;
      for (int yy = iy0; yy < iy1; ++yy) {
        const double wy = std::min<double>(yy + 1, y1) - std::max<double>(yy, y0);
        for (int xx = ix0; xx < ix1; ++xx) {
          const double wx =
              std::min<double>(xx + 1, x1) - std::max<double>(xx, x0);
          const double wgt = wy * wx;
          const uint8_t* p = src + (static_cast<size_t>(yy) * sw + xx) * 3;
          if (gray) {
            // match cv2 IMREAD_GRAYSCALE: BT.601 luma of the RGB decode
            acc[0] += wgt * (0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2]);
          } else {
            acc[0] += wgt * p[0];
            acc[1] += wgt * p[1];
            acc[2] += wgt * p[2];
          }
          area += wgt;
        }
      }
      float* q = dst + (static_cast<size_t>(y) * dw + x) * dc;
      for (int c = 0; c < dc; ++c)
        q[c] = static_cast<float>(acc[c] / area * scale);
    }
  }
}

// bilinear resample (cv2 INTER_LINEAR semantics): dst pixel (y, x) samples
// the source at ((y+0.5)·sy − 0.5, (x+0.5)·sx − 0.5), edge-clamped.  Used
// by providers whose reference loader resizes with cv2's default interp
// (LLFF) rather than INTER_AREA.
void resize_bilinear(const uint8_t* src, int sh, int sw, float* dst, int dh,
                     int dw, int gray, float scale) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  const int dc = gray ? 1 : 3;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    int iy0 = static_cast<int>(fy);
    if (iy0 > sh - 1) iy0 = sh - 1;
    const int iy1 = std::min(iy0 + 1, sh - 1);
    const double wy1 = fy - iy0, wy0 = 1.0 - wy1;
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      if (fx < 0) fx = 0;
      int ix0 = static_cast<int>(fx);
      if (ix0 > sw - 1) ix0 = sw - 1;
      const int ix1 = std::min(ix0 + 1, sw - 1);
      const double wx1 = fx - ix0, wx0 = 1.0 - wx1;
      const uint8_t* p00 = src + (static_cast<size_t>(iy0) * sw + ix0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(iy0) * sw + ix1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(iy1) * sw + ix0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(iy1) * sw + ix1) * 3;
      float* q = dst + (static_cast<size_t>(y) * dw + x) * dc;
      if (gray) {
        auto luma = [](const uint8_t* p) {
          return 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2];
        };
        const double v = wy0 * (wx0 * luma(p00) + wx1 * luma(p01)) +
                         wy1 * (wx0 * luma(p10) + wx1 * luma(p11));
        q[0] = static_cast<float>(v * scale);
      } else {
        for (int c = 0; c < 3; ++c) {
          const double v = wy0 * (wx0 * p00[c] + wx1 * p01[c]) +
                           wy1 * (wx0 * p10[c] + wx1 * p11[c]);
          q[c] = static_cast<float>(v * scale);
        }
      }
    }
  }
}

}  // namespace

// Decode n images (JPEG or PNG, auto-detected) and resize each to
// (dh, dw), writing float32 [n, dh, dw, 3] (or [n, dh, dw, 1] when gray)
// scaled by `scale` (e.g. 1/255).  interp: 0 = INTER_AREA box filter,
// 1 = INTER_LINEAR bilinear.  Parallel across images.  Returns the
// number of failures (failed slots are zero-filled).
int decode_resize_batch(const uint8_t** datas, const int64_t* sizes, int n,
                        float* dst, int dh, int dw, int gray, float scale,
                        int interp, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> fails(n_threads, 0);
  const int64_t stride = static_cast<int64_t>(dh) * dw * (gray ? 1 : 3);
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([=, &fails]() {
      std::vector<uint8_t> buf;
      for (int i = t; i < n; i += n_threads) {
        int h = 0, w = 0;
        bool ok = false;
        if (is_jpeg(datas[i], sizes[i])) {
          ok = decode_jpeg_rgb(datas[i], sizes[i], buf, &h, &w);
        } else if (is_png(datas[i], sizes[i])) {
          ok = decode_png_rgb(datas[i], sizes[i], buf, &h, &w);
        }
        if (!ok) {
          std::memset(dst + i * stride, 0, stride * sizeof(float));
          fails[t]++;
          continue;
        }
        if (interp == 1)
          resize_bilinear(buf.data(), h, w, dst + i * stride, dh, dw, gray,
                          scale);
        else
          resize_area(buf.data(), h, w, dst + i * stride, dh, dw, gray,
                      scale);
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

// Header-only dims probe (JPEG: header parse; PNG: IHDR).
int image_dims(const uint8_t* data, int64_t n, int* h, int* w) {
  std::vector<uint8_t> buf;
  if (is_jpeg(data, n)) {
    jpeg_decompress_struct cinfo;
    JpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = jpeg_err_exit;
    if (setjmp(err.jump)) {
      jpeg_destroy_decompress(&cinfo);
      return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(n));
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (is_png(data, n)) {
    if (n < 24) return 1;
    // IHDR follows the 8-byte signature + 8-byte chunk header (big-endian)
    auto be32 = [&](int64_t o) {
      return (static_cast<uint32_t>(data[o]) << 24) |
             (static_cast<uint32_t>(data[o + 1]) << 16) |
             (static_cast<uint32_t>(data[o + 2]) << 8) |
             static_cast<uint32_t>(data[o + 3]);
    };
    *w = static_cast<int>(be32(16));
    *h = static_cast<int>(be32(20));
    return 0;
  }
  return 1;
}
#endif  // HAVE_IMAGE_LIBS

}  // extern "C"
