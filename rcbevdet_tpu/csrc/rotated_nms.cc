// Rotated-BEV IoU + greedy NMS, host-side native implementation.
//
// TPU-native counterpart of the reference's CUDA rotated NMS
// (mmdet3d/ops/iou3d/src/iou3d_kernel.cu:253-345): exact convex-quad
// intersection via Sutherland–Hodgman clipping, greedy score-ordered
// suppression.  Runs on the host CPU over <=1000 top-K candidates per
// sample (post-processing is latency-critical at serving time; the pure
// NumPy/Python fallback in core/nms.py is the reference implementation
// for correctness tests).
//
// Build: g++ -O3 -shared -fPIC -o librotated_nms.so rotated_nms.cc
// ABI: plain C, consumed via ctypes (see core/nms_native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

// corners of (cx, cy, dx, dy, yaw), CCW
inline void box_corners(const float* b, Pt* out) {
  const double c = std::cos((double)b[4]), s = std::sin((double)b[4]);
  const double hx = 0.5 * b[2], hy = 0.5 * b[3];
  const double lx[4] = {hx, -hx, -hx, hx};
  const double ly[4] = {hy, hy, -hy, -hy};
  for (int i = 0; i < 4; ++i) {
    out[i].x = b[0] + c * lx[i] - s * ly[i];
    out[i].y = b[1] + s * lx[i] + c * ly[i];
  }
}

inline double poly_area(const Pt* p, int n) {
  double a = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& u = p[(i + n - 1) % n];
    const Pt& v = p[i];
    a += u.x * v.y - v.x * u.y;
  }
  return std::fabs(a) * 0.5;
}

// clip polygon by half-plane n.(p - c) <= 0
inline int clip_half_plane(const Pt* in, int n, double cx, double cy,
                           double nx, double ny, Pt* out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& cur = in[i];
    const Pt& prev = in[(i + n - 1) % n];
    const double dc = (cur.x - cx) * nx + (cur.y - cy) * ny;
    const double dp = (prev.x - cx) * nx + (prev.y - cy) * ny;
    const bool cin = dc <= 0, pin = dp <= 0;
    if (cin != pin) {
      const double t = dp / (dp - dc);
      out[m].x = prev.x + t * (cur.x - prev.x);
      out[m].y = prev.y + t * (cur.y - prev.y);
      ++m;
    }
    if (cin) out[m++] = cur;
  }
  return m;
}

double rotated_intersection(const Pt* a, const Pt* b) {
  Pt poly[16], tmp[16];
  std::memcpy(poly, a, 4 * sizeof(Pt));
  int n = 4;
  for (int e = 0; e < 4 && n > 0; ++e) {
    const Pt& c0 = b[e];
    const Pt& c1 = b[(e + 1) % 4];
    const double ex = c1.x - c0.x, ey = c1.y - c0.y;
    // CCW polygon: interior left of edge; keep n.(p-c) <= 0 with n = (ey, -ex)
    n = clip_half_plane(poly, n, c0.x, c0.y, ey, -ex, tmp);
    std::memcpy(poly, tmp, n * sizeof(Pt));
  }
  return n > 0 ? poly_area(poly, n) : 0.0;
}

}  // namespace

extern "C" {

// boxes: [n, 5] (x, y, dx, dy, yaw), float32. iou_out: [n, n] float32.
void rotated_iou_matrix(const float* boxes_a, int64_t na, const float* boxes_b,
                        int64_t nb, float* iou_out) {
  std::vector<Pt> ca(na * 4), cb(nb * 4);
  for (int64_t i = 0; i < na; ++i) box_corners(boxes_a + i * 5, &ca[i * 4]);
  for (int64_t j = 0; j < nb; ++j) box_corners(boxes_b + j * 5, &cb[j * 4]);
  for (int64_t i = 0; i < na; ++i) {
    const double area_a = (double)boxes_a[i * 5 + 2] * boxes_a[i * 5 + 3];
    for (int64_t j = 0; j < nb; ++j) {
      const double area_b = (double)boxes_b[j * 5 + 2] * boxes_b[j * 5 + 3];
      const double inter = rotated_intersection(&ca[i * 4], &cb[j * 4]);
      const double uni = area_a + area_b - inter;
      iou_out[i * nb + j] = uni > 0 ? (float)(inter / uni) : 0.0f;
    }
  }
}

// Greedy rotated NMS. boxes [n, 5] must be sorted by descending score.
// keep_out: caller-allocated [n] int64; returns number kept.
int64_t rotated_nms(const float* boxes, int64_t n, float iou_thresh,
                    int64_t post_max, int64_t* keep_out) {
  std::vector<Pt> corners(n * 4);
  std::vector<double> areas(n);
  std::vector<uint8_t> suppressed(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    box_corners(boxes + i * 5, &corners[i * 4]);
    areas[i] = (double)boxes[i * 5 + 2] * boxes[i * 5 + 3];
  }
  int64_t kept = 0;
  for (int64_t i = 0; i < n && kept < post_max; ++i) {
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    for (int64_t j = i + 1; j < n; ++j) {
      if (suppressed[j]) continue;
      // cheap reject: center distance > half diagonals sum
      const double dx = boxes[i * 5] - boxes[j * 5];
      const double dy = boxes[i * 5 + 1] - boxes[j * 5 + 1];
      const double ri = 0.5 * std::hypot((double)boxes[i * 5 + 2], (double)boxes[i * 5 + 3]);
      const double rj = 0.5 * std::hypot((double)boxes[j * 5 + 2], (double)boxes[j * 5 + 3]);
      if (dx * dx + dy * dy > (ri + rj) * (ri + rj)) continue;
      const double inter = rotated_intersection(&corners[i * 4], &corners[j * 4]);
      const double uni = areas[i] + areas[j] - inter;
      if (uni > 0 && inter / uni > iou_thresh) suppressed[j] = 1;
    }
  }
  return kept;
}

}  // extern "C"
