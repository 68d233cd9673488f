// Native data-preprocessing kernels for the animals3d_tpu input pipeline.
//
// The reference offloads its per-sample CPU work to OpenCV/libtorch C++
// (cv2.distanceTransform in `model/dataset/util.py:12-18`, packed-PNG
// feature decode `util.py:58-74`, torch DataLoader worker processes). This
// module provides the same hot paths as a dependency-free C++ library
// loaded via ctypes, so the Python loader threads spend their time in
// native code with the GIL released:
//
//   * exact Euclidean distance transform (Felzenszwalb & Huttenlocher's
//     two-pass lower-envelope algorithm) for the mask dt / inverse-dt pair;
//   * packed-tile feature decode (uint8 HxWxC tiles -> float CHW);
//   * batched bilinear resize (float CHW).
//
// Build: animals3d_tpu.native compiles this with `g++ -O3 -shared -fPIC`.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// 1-D squared distance transform of a sampled function f (length n).
void dt1d(const float* f, float* d, int* v, float* z, int n) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      s = ((f[q] + q * (float)q) - (f[v[k]] + v[k] * (float)v[k])) /
          (2.0f * q - 2.0f * v[k]);
      if (s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    float dq = q - (float)v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

// exact 2-D EDT of a binary indicator (inside = 0 seed, outside = +inf).
void edt2d(const uint8_t* seed, float* out, int h, int w) {
  std::vector<float> f(std::max(h, w));
  std::vector<float> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<float> z(std::max(h, w) + 1);
  std::vector<float> tmp((size_t)h * w);

  // columns
  for (int x = 0; x < w; ++x) {
    // large finite instead of inf: inf-inf in the envelope intersection
    // would produce NaNs and corrupt the stack walk
    for (int y = 0; y < h; ++y)
      f[y] = seed[(size_t)y * w + x] ? 0.0f : 1e18f;
    dt1d(f.data(), d.data(), v.data(), z.data(), h);
    for (int y = 0; y < h; ++y) tmp[(size_t)y * w + x] = d[y];
  }
  // rows
  for (int y = 0; y < h; ++y) {
    std::memcpy(f.data(), tmp.data() + (size_t)y * w, w * sizeof(float));
    dt1d(f.data(), d.data(), v.data(), z.data(), w);
    for (int x = 0; x < w; ++x)
      out[(size_t)y * w + x] = std::sqrt(d[x]);
  }
}

}  // namespace

extern "C" {

// mask: (h, w) float in [0, 1]; writes dt(mask) and dt(1-mask), each (h, w).
// Matches cv2.distanceTransform(bin, DIST_L2, DIST_MASK_PRECISE): distance
// of each zero pixel to the nearest nonzero pixel.
void mask_distance_transform(const float* mask, int h, int w, float* dt,
                             float* inv_dt) {
  std::vector<uint8_t> inside((size_t)h * w), outside((size_t)h * w);
  for (size_t i = 0; i < (size_t)h * w; ++i) {
    uint8_t m = mask[i] > 0.5f;
    inside[i] = !m;   // seeds for dt of the mask = background pixels
    outside[i] = m;
  }
  // cv2 semantics: dt value at pixel p = distance to nearest ZERO pixel of
  // the input; dt of mask has zeros outside, so seed = outside region.
  edt2d(inside.data(), dt, h, w);
  edt2d(outside.data(), inv_dt, h, w);
}

// packed uint8 image (h, n_tiles*w, 3) -> float32 (c, h, w) / 255.
void decode_packed_feat(const uint8_t* img, int h, int w, int n_tiles,
                        int n_channels, float* out) {
  for (int t = 0; t < n_tiles; ++t) {
    for (int cc = 0; cc < 3; ++cc) {
      int c = t * 3 + cc;
      if (c >= n_channels) return;
      float* dst = out + (size_t)c * h * w;
      for (int y = 0; y < h; ++y) {
        const uint8_t* row = img + ((size_t)y * n_tiles * w + (size_t)t * w) * 3;
        for (int x = 0; x < w; ++x)
          dst[(size_t)y * w + x] = row[(size_t)x * 3 + cc] / 255.0f;
      }
    }
  }
}

// bilinear resize float (c, h, w) -> (c, oh, ow), align_corners=False.
void resize_bilinear(const float* src, int c, int h, int w, int oh, int ow,
                     float* dst) {
  for (int ch = 0; ch < c; ++ch) {
    const float* s = src + (size_t)ch * h * w;
    float* d = dst + (size_t)ch * oh * ow;
    for (int y = 0; y < oh; ++y) {
      float fy = (y + 0.5f) * h / oh - 0.5f;
      int y0 = (int)std::floor(fy);
      float ty = fy - y0;
      int y0c = y0 < 0 ? 0 : (y0 >= h ? h - 1 : y0);
      int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= h ? h - 1 : y0 + 1);
      for (int x = 0; x < ow; ++x) {
        float fx = (x + 0.5f) * w / ow - 0.5f;
        int x0 = (int)std::floor(fx);
        float tx = fx - x0;
        int x0c = x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0);
        int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= w ? w - 1 : x0 + 1);
        float v00 = s[(size_t)y0c * w + x0c], v01 = s[(size_t)y0c * w + x1c];
        float v10 = s[(size_t)y1c * w + x0c], v11 = s[(size_t)y1c * w + x1c];
        d[(size_t)y * ow + x] = (1 - ty) * ((1 - tx) * v00 + tx * v01) +
                                ty * ((1 - tx) * v10 + tx * v11);
      }
    }
  }
}

}  // extern "C"
