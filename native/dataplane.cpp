// ffwm_tpu native data plane — host-side pixel kernels.
//
// The reference's host pipeline does its augmentation in OpenCV
// (data/face_dataset.py:110-130) inside torch DataLoader worker processes.
// Here the hot per-image pixel work (rotation warp, horizontal flip, uint8
// -> float normalization, mask thresholding) is C++ compiled -O3; Python
// data-loader threads call in via ctypes, which releases the GIL, so decode/
// augment runs genuinely parallel on host cores while the TPU computes.
//
// Semantics match cv2.warpAffine(..., INTER_LINEAR, borderValue=0) with a
// cv2.getRotationMatrix2D(center, angle, 1) rotation, which is what both
// the reference and ffwm_tpu.data.face_dataset.rotate_augment use.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Rotate an HxWxC uint8 image by `angle_deg` around the image center
// (OpenCV convention: positive = counter-clockwise in image coords),
// bilinear sampling, constant-zero border.
void rotate_u8(const uint8_t* src, uint8_t* dst, int h, int w, int c,
               double angle_deg) {
  const double a = angle_deg * M_PI / 180.0;
  const double ca = std::cos(a), sa = std::sin(a);
  const double cx = w / 2, cy = h / 2;  // integer-truncated like OpenCV's
                                        // (w//2, h//2) center in the callers
  // Inverse map: dst(x,y) <- src(M^{-1} [x,y,1]). For a pure rotation about
  // (cx, cy), the inverse rotates by -angle.
  for (int y = 0; y < h; ++y) {
    const double dy = y - cy;
    for (int x = 0; x < w; ++x) {
      const double dx = x - cx;
      const double sx = ca * dx - sa * dy + cx;
      const double sy = sa * dx + ca * dy + cy;
      const int x0 = (int)std::floor(sx);
      const int y0 = (int)std::floor(sy);
      const double fx = sx - x0, fy = sy - y0;
      uint8_t* out = dst + (y * w + x) * c;
      if (x0 < -1 || x0 >= w || y0 < -1 || y0 >= h) {
        std::memset(out, 0, c);
        continue;
      }
      const bool vx0 = x0 >= 0, vx1 = x0 + 1 < w;
      const bool vy0 = y0 >= 0, vy1 = y0 + 1 < h;
      for (int ch = 0; ch < c; ++ch) {
        const double p00 = (vx0 && vy0) ? src[(y0 * w + x0) * c + ch] : 0.0;
        const double p10 = (vx1 && vy0) ? src[(y0 * w + x0 + 1) * c + ch] : 0.0;
        const double p01 = (vx0 && vy1) ? src[((y0 + 1) * w + x0) * c + ch] : 0.0;
        const double p11 = (vx1 && vy1) ? src[((y0 + 1) * w + x0 + 1) * c + ch] : 0.0;
        const double v = p00 * (1 - fx) * (1 - fy) + p10 * fx * (1 - fy) +
                         p01 * (1 - fx) * fy + p11 * fx * fy;
        out[ch] = (uint8_t)std::lround(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// uint8 HWC -> float32 HWC scaled by 1/255 (the /255 normalization of
// data/face_dataset.py:77-80).
void u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  // Meyers singleton: C++11 guarantees thread-safe one-time init. The old
  // lazy-fill-with-atomic-flag had a race — threads that saw the flag
  // false all wrote the (non-atomic) table while others could be reading.
  struct Lut {
    float v[256];
    Lut() {
      for (int i = 0; i < 256; ++i) v[i] = (float)i / 255.0f;
    }
  };
  static const Lut lut;
  for (int64_t i = 0; i < n; ++i) dst[i] = lut.v[src[i]];
}

// Horizontal flip of an HxWxC array (any element size es).
void hflip(const uint8_t* src, uint8_t* dst, int h, int w, int c, int es) {
  const int row = w * c * es;
  const int px = c * es;
  for (int y = 0; y < h; ++y) {
    const uint8_t* s = src + y * row;
    uint8_t* d = dst + y * row;
    for (int x = 0; x < w; ++x)
      std::memcpy(d + x * px, s + (w - 1 - x) * px, px);
  }
}

// Binary threshold: v > 0 -> 255 (mask re-binarization after rotation,
// data/face_dataset.py:118).
void threshold_u8(uint8_t* buf, int64_t n) {
  for (int64_t i = 0; i < n; ++i) buf[i] = buf[i] > 0 ? 255 : 0;
}

// Batched u8->f32 across a contiguous stack of images using host threads
// (for the preload path, where one big conversion dominates).
void u8_to_f32_parallel(const uint8_t* src, float* dst, int64_t n,
                        int n_threads) {
  if (n_threads <= 1) { u8_to_f32(src, dst, n); return; }
  std::vector<std::thread> ts;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([=] { u8_to_f32(src + lo, dst + lo, hi - lo); });
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
