// Native image preprocessing for the OCR front end.
//
// Fuses the host pixel pipeline the reference implements in Rust
// (main.rs:331-481, 1258-1326): Catmull-Rom resize (antialiased on
// downscale, PIL-compatible separable filtering), letterbox pad-to-square,
// [-1,1] float32 NCHW normalization, clockwise rotation, and the
// auto-rotate heuristic kernels (BT.601 gray, dx/dy edge-energy ratio,
// dark-top-vs-bottom fraction).
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Catmull-Rom cubic (a = -0.5), the filter PIL calls BICUBIC.
inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterTable {
  std::vector<double> weights;  // [out, ksize]
  std::vector<int> bounds;      // [out, 2] (start, count)
  int ksize;
};

// PIL-compatible coefficient precomputation (antialias on downscale).
FilterTable build_table(int in_size, int out_size) {
  FilterTable t;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;  // bicubic support = 2
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.ksize = ksize;
  t.weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  t.bounds.assign(static_cast<size_t>(out_size) * 2, 0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* w = &t.weights[static_cast<size_t>(xx) * ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double wv = cubic((x + xmin - center + 0.5) / filterscale);
      w[x] = wv;
      ww += wv;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax; ++x) w[x] /= ww;
    }
    t.bounds[xx * 2] = xmin;
    t.bounds[xx * 2 + 1] = xmax;
  }
  return t;
}

inline uint8_t clip8(double v) {
  if (v <= 0.0) return 0;
  if (v >= 255.0) return 255;
  return static_cast<uint8_t>(v + 0.5);
}

// Separable RGB8 resize: horizontal then vertical pass in double precision.
void resize_rgb(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                int dh) {
  FilterTable ht = build_table(sw, dw);
  FilterTable vt = build_table(sh, dh);

  std::vector<double> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    double* out = &tmp[static_cast<size_t>(y) * dw * 3];
    for (int x = 0; x < dw; ++x) {
      int xmin = ht.bounds[x * 2];
      int cnt = ht.bounds[x * 2 + 1];
      const double* w = &ht.weights[static_cast<size_t>(x) * ht.ksize];
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < cnt; ++i) {
        const uint8_t* p = row + static_cast<size_t>(xmin + i) * 3;
        r += p[0] * w[i];
        g += p[1] * w[i];
        b += p[2] * w[i];
      }
      out[x * 3 + 0] = r;
      out[x * 3 + 1] = g;
      out[x * 3 + 2] = b;
    }
  }

  for (int y = 0; y < dh; ++y) {
    int ymin = vt.bounds[y * 2];
    int cnt = vt.bounds[y * 2 + 1];
    const double* w = &vt.weights[static_cast<size_t>(y) * vt.ksize];
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < cnt; ++i) {
        const double* p = &tmp[(static_cast<size_t>(ymin + i) * dw + x) * 3];
        r += p[0] * w[i];
        g += p[1] * w[i];
        b += p[2] * w[i];
      }
      out[x * 3 + 0] = clip8(r);
      out[x * 3 + 1] = clip8(g);
      out[x * 3 + 2] = clip8(b);
    }
  }
}

}  // namespace

extern "C" {

// Resize RGB8 HWC buffer to (dw, dh). Catmull-Rom, PIL-BICUBIC compatible.
void ds_resize_bicubic(const uint8_t* src, int sw, int sh, uint8_t* dst,
                       int dw, int dh) {
  resize_rgb(src, sw, sh, dst, dw, dh);
}

// Fused letterbox: resize to fit `size` (preserving aspect), paste centered
// on a pad_color canvas, normalize to [-1, 1] float32 planes [3, size, size].
// (reference main.rs:462-481 + 1300-1326 in one pass)
void ds_pad_normalize(const uint8_t* src, int w, int h, float* out, int size,
                      uint8_t pad_color) {
  double scale = std::min(static_cast<double>(size) / w,
                          static_cast<double>(size) / h);
  int nw = std::max(1, static_cast<int>(std::lround(w * scale)));
  int nh = std::max(1, static_cast<int>(std::lround(h * scale)));
  std::vector<uint8_t> resized(static_cast<size_t>(nw) * nh * 3);
  resize_rgb(src, w, h, resized.data(), nw, nh);

  int off_x = (size - nw) / 2;
  int off_y = (size - nh) / 2;
  const float pad = pad_color / 255.0f * 2.0f - 1.0f;
  size_t plane = static_cast<size_t>(size) * size;
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      size_t idx = static_cast<size_t>(y) * size + x;
      if (y >= off_y && y < off_y + nh && x >= off_x && x < off_x + nw) {
        const uint8_t* p =
            &resized[(static_cast<size_t>(y - off_y) * nw + (x - off_x)) * 3];
        out[idx] = p[0] / 255.0f * 2.0f - 1.0f;
        out[plane + idx] = p[1] / 255.0f * 2.0f - 1.0f;
        out[2 * plane + idx] = p[2] / 255.0f * 2.0f - 1.0f;
      } else {
        out[idx] = pad;
        out[plane + idx] = pad;
        out[2 * plane + idx] = pad;
      }
    }
  }
}

// Normalize an RGB8 HWC buffer to [-1,1] float32 CHW planes.
void ds_normalize_chw(const uint8_t* src, int w, int h, float* out) {
  size_t plane = static_cast<size_t>(w) * h;
  for (size_t i = 0; i < plane; ++i) {
    out[i] = src[i * 3 + 0] / 255.0f * 2.0f - 1.0f;
    out[plane + i] = src[i * 3 + 1] / 255.0f * 2.0f - 1.0f;
    out[2 * plane + i] = src[i * 3 + 2] / 255.0f * 2.0f - 1.0f;
  }
}

// Dynamic tiling: resize to (size*tw, size*th) then emit tw*th normalized
// float32 CHW tiles (row-major tile order, reference main.rs:1287-1296).
void ds_tile_normalize(const uint8_t* src, int w, int h, float* out, int size,
                       int tiles_w, int tiles_h) {
  int rw = size * tiles_w;
  int rh = size * tiles_h;
  std::vector<uint8_t> resized(static_cast<size_t>(rw) * rh * 3);
  resize_rgb(src, w, h, resized.data(), rw, rh);
  size_t plane = static_cast<size_t>(size) * size;
  for (int t = 0; t < tiles_w * tiles_h; ++t) {
    int tx = (t % tiles_w) * size;
    int ty = (t / tiles_w) * size;
    float* tile = out + static_cast<size_t>(t) * 3 * plane;
    for (int y = 0; y < size; ++y) {
      const uint8_t* row =
          &resized[(static_cast<size_t>(ty + y) * rw + tx) * 3];
      size_t idx = static_cast<size_t>(y) * size;
      for (int x = 0; x < size; ++x) {
        tile[idx + x] = row[x * 3 + 0] / 255.0f * 2.0f - 1.0f;
        tile[plane + idx + x] = row[x * 3 + 1] / 255.0f * 2.0f - 1.0f;
        tile[2 * plane + idx + x] = row[x * 3 + 2] / 255.0f * 2.0f - 1.0f;
      }
    }
  }
}

// Clockwise rotation of an RGB8 HWC buffer. deg in {90, 180, 270}.
void ds_rotate_cw(const uint8_t* src, int w, int h, uint8_t* dst, int deg) {
  if (deg == 180) {
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const uint8_t* p = src + (static_cast<size_t>(y) * w + x) * 3;
        uint8_t* q =
            dst + (static_cast<size_t>(h - 1 - y) * w + (w - 1 - x)) * 3;
        q[0] = p[0];
        q[1] = p[1];
        q[2] = p[2];
      }
  } else if (deg == 90) {  // (x,y) -> (h-1-y, x) in a h x w -> w x h image
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const uint8_t* p = src + (static_cast<size_t>(y) * w + x) * 3;
        uint8_t* q = dst + (static_cast<size_t>(x) * h + (h - 1 - y)) * 3;
        q[0] = p[0];
        q[1] = p[1];
        q[2] = p[2];
      }
  } else if (deg == 270) {
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const uint8_t* p = src + (static_cast<size_t>(y) * w + x) * 3;
        uint8_t* q = dst + (static_cast<size_t>(w - 1 - x) * h + y) * 3;
        q[0] = p[0];
        q[1] = p[1];
        q[2] = p[2];
      }
  } else {
    std::memcpy(dst, src, static_cast<size_t>(w) * h * 3);
  }
}

// BT.601 integer luma (reference main.rs:340-346).
void ds_gray(const uint8_t* src, int w, int h, uint8_t* dst) {
  size_t n = static_cast<size_t>(w) * h;
  for (size_t i = 0; i < n; ++i) {
    uint32_t r = src[i * 3], g = src[i * 3 + 1], b = src[i * 3 + 2];
    dst[i] = static_cast<uint8_t>((77 * r + 150 * g + 29 * b) >> 8);
  }
}

// dx/dy edge-energy ratio with the reference's striding (main.rs:360-387).
double ds_edge_ratio_dx_dy(const uint8_t* gray, int w, int h) {
  if (w < 2 || h < 2) return 1.0;
  int step = std::max(std::max(w, h) / 256, 1);
  uint64_t dx = 0, dy = 0;
  for (int y = 0; y < h; y += step) {
    for (int x = 0; x < w; x += step) {
      int g = gray[static_cast<size_t>(y) * w + x];
      if (x + step < w)
        dx += std::abs(g - gray[static_cast<size_t>(y) * w + x + step]);
      if (y + step < h)
        dy += std::abs(g - gray[static_cast<size_t>(y + step) * w + x]);
    }
  }
  return static_cast<double>(dx) / (static_cast<double>(dy) + 1e-9);
}

// Dark-pixel fraction, top half minus bottom half (main.rs:389-423).
double ds_dark_top_minus_bottom(const uint8_t* gray, int w, int h,
                                uint8_t thr) {
  if (w == 0 || h == 0) return 0.0;
  int step = std::max(std::max(w, h) / 256, 1);
  int mid = h / 2;
  uint64_t top_cnt = 0, top_dark = 0, bot_cnt = 0, bot_dark = 0;
  for (int y = 0; y < h; y += step) {
    for (int x = 0; x < w; x += step) {
      bool dark = gray[static_cast<size_t>(y) * w + x] < thr;
      if (y < mid) {
        ++top_cnt;
        top_dark += dark;
      } else {
        ++bot_cnt;
        bot_dark += dark;
      }
    }
  }
  double top = static_cast<double>(top_dark) / (top_cnt + 1e-9);
  double bot = static_cast<double>(bot_dark) / (bot_cnt + 1e-9);
  return top - bot;
}

}  // extern "C"
