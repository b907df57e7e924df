// Native image preprocessing for the data pipeline (SURVEY hard-part #7:
// 6 cams x 9 frames of decode+resize per sample is the input-pipeline
// wall).  Implements the PIL operation chain of the reference's
// PrepareImageInputs (mmdet3d/datasets/pipelines/loading.py:1639-1646):
//   resize (bicubic, PIL-style support scaling) -> crop -> horizontal flip
//   -> rotate (nearest, around the crop center) -> ImageNet normalize
// fused into one pass over uint8 RGB, emitting float32 HWC.
//
// The resize replicates PIL's ImagingResample structure: a separable
// two-pass convolution whose kernel support scales with the downscale
// factor (anti-aliasing), bicubic kernel a = -0.5.  Coefficients use
// float32 (PIL uses int16 fixed point), so outputs may differ from PIL by
// ~1/255 — the Python wrapper tests pin that tolerance.
//
// Build: g++ -O3 -shared -fPIC -o libimage_ops.so image_ops.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <atomic>

namespace {

inline double bicubic(double x) {
  // PIL's bicubic filter (a = -0.5), support 2.
  constexpr double a = -0.5;
  x = x < 0 ? -x : x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  std::vector<int> bounds;     // [out] first source index
  std::vector<int> counts;     // [out] number of taps
  std::vector<float> weights;  // [out * ksize]
  int ksize;
};

// PIL precompute_coeffs: support scaled by max(scale, 1).
Coeffs precompute(int in_size, int out_size) {
  constexpr double support0 = 2.0;  // bicubic
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support0 * filterscale;
  int ksize = (int)std::ceil(support) * 2 + 1;

  Coeffs c;
  c.ksize = ksize;
  c.bounds.resize(out_size);
  c.counts.resize(out_size);
  c.weights.assign((size_t)out_size * ksize, 0.0f);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    double ss = 0.0;
    std::vector<double> w(n);
    for (int x = 0; x < n; ++x) {
      double val = bicubic((x + xmin - center + 0.5) / filterscale);
      w[x] = val;
      ss += val;
    }
    c.bounds[xx] = xmin;
    c.counts[xx] = n;
    for (int x = 0; x < n; ++x)
      c.weights[(size_t)xx * ksize + x] = (float)(ss != 0.0 ? w[x] / ss : 0.0);
  }
  return c;
}

inline float clamp255(float v) {
  // PIL quantizes to uint8 after each resample pass (int16 fixed point
  // with round-half-up); mirror that so outputs track PIL within ~1/255
  v = std::round(v);
  return v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
}

}  // namespace

extern "C" {

// Bicubic resize uint8 RGB [sh, sw, 3] -> float32 RGB [dh, dw, 3]
// (values still in 0..255, PIL-clamped per pass).
void resize_bicubic_u8(const uint8_t* src, int sh, int sw, float* dst,
                       int dh, int dw) {
  Coeffs cx = precompute(sw, dw);
  Coeffs cy = precompute(sh, dh);

  // pass 1: horizontal, [sh, dw, 3]
  std::vector<float> tmp((size_t)sh * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + (size_t)y * sw * 3;
    float* trow = tmp.data() + (size_t)y * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = cx.weights.data() + (size_t)x * cx.ksize;
      int x0 = cx.bounds[x], n = cx.counts[x];
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = row + (size_t)(x0 + k) * 3;
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      trow[x * 3 + 0] = clamp255(r);
      trow[x * 3 + 1] = clamp255(g);
      trow[x * 3 + 2] = clamp255(b);
    }
  }
  // pass 2: vertical
  for (int y = 0; y < dh; ++y) {
    const float* w = cy.weights.data() + (size_t)y * cy.ksize;
    int y0 = cy.bounds[y], n = cy.counts[y];
    float* drow = dst + (size_t)y * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < n; ++k)
        acc += w[k] * tmp[(size_t)(y0 + k) * dw * 3 + x];
      drow[x] = clamp255(acc);
    }
  }
}

// Fused chain: resize(sw,sh -> nw,nh) -> crop(x0,y0,x1,y1) -> flip ->
// rotate (degrees CCW, nearest, around crop center, zero fill) ->
// (v - mean) / std.  Output float32 [y1-y0, x1-x0, 3].
void transform_normalize_u8(const uint8_t* src, int sh, int sw, int nh,
                            int nw, int cx0, int cy0, int cx1, int cy1,
                            int flip, double rotate_deg, const float* mean,
                            const float* stdv, float* out) {
  std::vector<float> resized((size_t)nh * nw * 3);
  resize_bicubic_u8(src, sh, sw, resized.data(), nh, nw);

  int fw = cx1 - cx0, fh = cy1 - cy0;
  // crop (+ zero padding outside the resized image, PIL crop semantics)
  std::vector<float> cropped((size_t)fh * fw * 3, 0.0f);
  for (int y = 0; y < fh; ++y) {
    int sy = y + cy0;
    if (sy < 0 || sy >= nh) continue;
    for (int x = 0; x < fw; ++x) {
      int sx = x + cx0;
      if (sx < 0 || sx >= nw) continue;
      std::memcpy(&cropped[((size_t)y * fw + x) * 3],
                  &resized[((size_t)sy * nw + sx) * 3], 3 * sizeof(float));
    }
  }
  if (flip) {
    for (int y = 0; y < fh; ++y)
      for (int x = 0; x < fw / 2; ++x)
        for (int ch = 0; ch < 3; ++ch) {
          std::swap(cropped[((size_t)y * fw + x) * 3 + ch],
                    cropped[((size_t)y * fw + (fw - 1 - x)) * 3 + ch]);
        }
  }

  const double rad = rotate_deg * M_PI / 180.0;
  const double cs = std::cos(rad), sn = std::sin(rad);
  const double ccx = fw / 2.0, ccy = fh / 2.0;
  const bool rot = rotate_deg != 0.0;

  for (int y = 0; y < fh; ++y) {
    for (int x = 0; x < fw; ++x) {
      float px[3] = {0, 0, 0};
      if (!rot) {
        std::memcpy(px, &cropped[((size_t)y * fw + x) * 3],
                    3 * sizeof(float));
      } else {
        // PIL rotate: dst(x,y) = src(inverse-rotated), nearest = floor of
        // the source coordinate at the pixel center (calibrated vs PIL:
        // >=99.9% pixel-exact; residual differences come from PIL's
        // fixed-point matrix coefficients), zero fill
        double dx = x + 0.5 - ccx, dy = y + 0.5 - ccy;
        int sx = (int)std::floor(cs * dx - sn * dy + ccx);
        int sy = (int)std::floor(sn * dx + cs * dy + ccy);
        if (sx >= 0 && sx < fw && sy >= 0 && sy < fh)
          std::memcpy(px, &cropped[((size_t)sy * fw + sx) * 3],
                      3 * sizeof(float));
      }
      float* o = out + ((size_t)y * fw + x) * 3;
      for (int ch = 0; ch < 3; ++ch)
        o[ch] = (px[ch] - mean[ch]) / stdv[ch];
    }
  }
}

// Batched variant: n images processed by a small std::thread pool —
// bypasses Python-side threading for the 54-images-per-sample hot loop.
void transform_normalize_batch_u8(const uint8_t* src, int n, int sh, int sw,
                                  const int* nh, const int* nw,
                                  const int* crops /* [n,4] */,
                                  const uint8_t* flips,
                                  const double* rotates, const float* mean,
                                  const float* stdv, float* out, int fh,
                                  int fw, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      transform_normalize_u8(
          src + (size_t)i * sh * sw * 3, sh, sw, nh[i], nw[i],
          crops[i * 4 + 0], crops[i * 4 + 1], crops[i * 4 + 2],
          crops[i * 4 + 3], flips[i], rotates[i], mean, stdv,
          out + (size_t)i * fh * fw * 3);
    }
  };
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

}  // extern "C"
