// Native host-side image ops for the data pipeline.
//
// TPU-native counterpart of the reference's native layer: where the reference
// JIT-compiles CUDA kernels for the GPU hot path (torch_utils/ops/*.cu) and
// leans on OpenCV's C++ for CPU geometry, this framework runs the compute hot
// path in XLA/Pallas and keeps a small native library for the *host* side of
// the input pipeline: perspective warps, polygon fills, dilation, and line
// rasterization used during sample preparation (training/dataset.py:838-927
// semantics).  Built as a plain shared object, bound via ctypes
// (pasta_gan_tpu/native/__init__.py), with numpy/cv2 fallbacks.
//
// All images are float32 HWC, row-major.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Bilinear perspective warp.
//   src: [src_h, src_w, ch], dst: [dst_h, dst_w, ch]
//   M: 3x3 row-major mapping src->dst (cv2 convention: we invert internally)
//   border: 0 = constant(0), 1 = replicate
void warp_perspective_f32(const float* src, int src_h, int src_w, int ch,
                          float* dst, int dst_h, int dst_w, const double* M,
                          int border) {
  // invert M (3x3)
  double a = M[0], b = M[1], c = M[2], d = M[3], e = M[4], f = M[5], g = M[6],
         h = M[7], i = M[8];
  double det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
  if (std::abs(det) < 1e-12) det = 1e-12;
  double inv[9] = {
      (e * i - f * h) / det, (c * h - b * i) / det, (b * f - c * e) / det,
      (f * g - d * i) / det, (a * i - c * g) / det, (c * d - a * f) / det,
      (d * h - e * g) / det, (b * g - a * h) / det, (a * e - b * d) / det};

  auto row_task = [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      for (int x = 0; x < dst_w; ++x) {
        double denom = inv[6] * x + inv[7] * y + inv[8];
        if (std::abs(denom) < 1e-12) denom = 1e-12;
        double sx = (inv[0] * x + inv[1] * y + inv[2]) / denom;
        double sy = (inv[3] * x + inv[4] * y + inv[5]) / denom;
        int x0 = (int)std::floor(sx), y0i = (int)std::floor(sy);
        float fx = (float)(sx - x0), fy = (float)(sy - y0i);
        float* out = dst + ((size_t)y * dst_w + x) * ch;
        for (int k = 0; k < ch; ++k) {
          float v[4];
          for (int n = 0; n < 4; ++n) {
            int yy = y0i + n / 2, xx = x0 + n % 2;
            bool inside = (yy >= 0 && yy < src_h && xx >= 0 && xx < src_w);
            if (!inside && border == 0) {
              v[n] = 0.0f;
            } else {
              int yc = std::min(std::max(yy, 0), src_h - 1);
              int xc = std::min(std::max(xx, 0), src_w - 1);
              v[n] = src[((size_t)yc * src_w + xc) * ch + k];
            }
          }
          float top = v[0] * (1 - fx) + v[1] * fx;
          float bot = v[2] * (1 - fx) + v[3] * fx;
          out[k] = top * (1 - fy) + bot * fy;
        }
      }
    }
  };

  int n_threads = std::min((int)std::thread::hardware_concurrency(),
                           std::max(1, dst_h / 64));
  if (n_threads <= 1) {
    row_task(0, dst_h);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (dst_h + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int y0 = t * chunk, y1 = std::min(dst_h, y0 + chunk);
    if (y0 < y1) threads.emplace_back(row_task, y0, y1);
  }
  for (auto& th : threads) th.join();
}

// Even-odd polygon fill into a [h, w] float32 mask (values 0/1).
void fill_polygon_f32(const double* pts_xy, int n_pts, float* mask, int h,
                      int w) {
  std::memset(mask, 0, sizeof(float) * (size_t)h * w);
  for (int y = 0; y < h; ++y) {
    // collect x-intersections of scanline y+0.5 with polygon edges
    std::vector<double> xs;
    for (int i = 0, j = n_pts - 1; i < n_pts; j = i++) {
      double xi = pts_xy[2 * i], yi = pts_xy[2 * i + 1];
      double xj = pts_xy[2 * j], yj = pts_xy[2 * j + 1];
      double yc = y + 0.5;
      if ((yi > yc) != (yj > yc)) {
        xs.push_back(xi + (yc - yi) * (xj - xi) / (yj - yi));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int x0 = std::max(0, (int)std::ceil(xs[k] - 0.5));
      int x1 = std::min(w - 1, (int)std::floor(xs[k + 1] - 0.5));
      for (int x = x0; x <= x1; ++x) mask[(size_t)y * w + x] = 1.0f;
    }
  }
}

// Binary box dilation: [h, w] float32 in-place-safe (src != dst).
void dilate_box_f32(const float* src, float* dst, int h, int w, int ksize) {
  int r = ksize / 2;
  int r2 = ksize - 1 - r;  // asymmetric for even kernels (cv2 anchor center)
  // horizontal pass
  std::vector<float> tmp((size_t)h * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float m = 0.0f;
      int x0 = std::max(0, x - r), x1 = std::min(w - 1, x + r2);
      for (int xx = x0; xx <= x1; ++xx) m = std::max(m, src[(size_t)y * w + xx]);
      tmp[(size_t)y * w + x] = m;
    }
  }
  // vertical pass
  for (int y = 0; y < h; ++y) {
    int y0 = std::max(0, y - r), y1 = std::min(h - 1, y + r2);
    for (int x = 0; x < w; ++x) {
      float m = 0.0f;
      for (int yy = y0; yy <= y1; ++yy) m = std::max(m, tmp[(size_t)yy * w + x]);
      dst[(size_t)y * w + x] = m;
    }
  }
}

// Thick line into a [h, w, 3] uint8 canvas.
void draw_line_u8(uint8_t* img, int h, int w, int x0, int y0, int x1, int y1,
                  uint8_t r, uint8_t g, uint8_t b, int thickness) {
  int steps = std::max({std::abs(x1 - x0), std::abs(y1 - y0), 1}) * 2;
  int tr = thickness / 2;
  for (int s = 0; s <= steps; ++s) {
    double t = (double)s / steps;
    int x = (int)std::lround(x0 + t * (x1 - x0));
    int y = (int)std::lround(y0 + t * (y1 - y0));
    for (int dy = -tr; dy <= tr; ++dy) {
      for (int dx = -tr; dx <= tr; ++dx) {
        int yy = y + dy, xx = x + dx;
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        uint8_t* p = img + ((size_t)yy * w + xx) * 3;
        p[0] = r;
        p[1] = g;
        p[2] = b;
      }
    }
  }
}

}  // extern "C"
