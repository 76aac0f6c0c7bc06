// Mean squared distance to the 3 nearest neighbors, per point.
//
// Native (host C++) equivalent of the reference's CUDA simple-knn
// (submodules/simple-knn/simple_knn.cu:45-200): Morton-order the points,
// partition the sorted order into boxes with min/max bounds, and for each
// point scan candidate boxes with bound-distance rejection. Multi-threaded
// over points; exposed via C ABI for ctypes.
//
// Algorithmic shape follows the public simple-knn design (Morton sort +
// AABB-box rejection); implementation is original host code.

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBoxSize = 128;
constexpr int kK = 3;

struct Box {
  float minx, miny, minz;
  float maxx, maxy, maxz;
};

inline uint64_t expand_bits_21(uint64_t v) {
  // spread the low 21 bits of v so consecutive bits are 3 apart
  v &= 0x1fffff;
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

inline uint64_t morton3d(float x, float y, float z, const float* lo,
                         const float* inv_extent) {
  const double scale = (double)((1 << 21) - 1);
  uint64_t xi = (uint64_t)(scale * std::min(1.0f, std::max(0.0f, (x - lo[0]) * inv_extent[0])));
  uint64_t yi = (uint64_t)(scale * std::min(1.0f, std::max(0.0f, (y - lo[1]) * inv_extent[1])));
  uint64_t zi = (uint64_t)(scale * std::min(1.0f, std::max(0.0f, (z - lo[2]) * inv_extent[2])));
  return (expand_bits_21(xi) << 2) | (expand_bits_21(yi) << 1) | expand_bits_21(zi);
}

inline float box_dist2(const Box& b, float x, float y, float z) {
  float dx = std::max({b.minx - x, 0.0f, x - b.maxx});
  float dy = std::max({b.miny - y, 0.0f, y - b.maxy});
  float dz = std::max({b.minz - z, 0.0f, z - b.maxz});
  return dx * dx + dy * dy + dz * dz;
}

}  // namespace

extern "C" {

// points: (n, 3) float32, out: (n,) float32 mean of squared distances to the
// 3 nearest neighbors. Returns 0 on success.
int mean_sq_dist_3nn(const float* points, int64_t n, float* out,
                     int num_threads) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    return 0;
  }
  float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], points[i * 3 + d]);
      hi[d] = std::max(hi[d], points[i * 3 + d]);
    }
  }
  float inv_extent[3];
  for (int d = 0; d < 3; ++d) {
    float e = hi[d] - lo[d];
    inv_extent[d] = e > 0 ? 1.0f / e : 0.0f;
  }

  std::vector<std::pair<uint64_t, int64_t>> order(n);
  for (int64_t i = 0; i < n; ++i) {
    order[i] = {morton3d(points[i * 3], points[i * 3 + 1], points[i * 3 + 2],
                         lo, inv_extent),
                i};
  }
  std::sort(order.begin(), order.end());

  const int64_t num_boxes = (n + kBoxSize - 1) / kBoxSize;
  std::vector<Box> boxes(num_boxes);
  for (int64_t b = 0; b < num_boxes; ++b) {
    Box box = {FLT_MAX, FLT_MAX, FLT_MAX, -FLT_MAX, -FLT_MAX, -FLT_MAX};
    int64_t end = std::min<int64_t>((b + 1) * kBoxSize, n);
    for (int64_t j = b * kBoxSize; j < end; ++j) {
      const float* p = points + order[j].second * 3;
      box.minx = std::min(box.minx, p[0]); box.maxx = std::max(box.maxx, p[0]);
      box.miny = std::min(box.miny, p[1]); box.maxy = std::max(box.maxy, p[1]);
      box.minz = std::min(box.minz, p[2]); box.maxz = std::max(box.maxz, p[2]);
    }
    boxes[b] = box;
  }

  // second level: super-boxes over groups of kSuper boxes for coarse rejection
  constexpr int64_t kSuper = 32;
  const int64_t num_super = (num_boxes + kSuper - 1) / kSuper;
  std::vector<Box> supers(num_super);
  for (int64_t sb = 0; sb < num_super; ++sb) {
    Box box = {FLT_MAX, FLT_MAX, FLT_MAX, -FLT_MAX, -FLT_MAX, -FLT_MAX};
    int64_t end = std::min<int64_t>((sb + 1) * kSuper, num_boxes);
    for (int64_t b = sb * kSuper; b < end; ++b) {
      box.minx = std::min(box.minx, boxes[b].minx); box.maxx = std::max(box.maxx, boxes[b].maxx);
      box.miny = std::min(box.miny, boxes[b].miny); box.maxy = std::max(box.maxy, boxes[b].maxy);
      box.minz = std::min(box.minz, boxes[b].minz); box.maxz = std::max(box.maxz, boxes[b].maxz);
    }
    supers[sb] = box;
  }

  if (num_threads <= 0)
    num_threads = (int)std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int64_t> cursor{0};

  auto worker = [&]() {
    constexpr int64_t kChunk = 256;
    while (true) {
      int64_t s = cursor.fetch_add(kChunk);
      if (s >= n) break;
      int64_t e = std::min(s + kChunk, n);
      for (int64_t oi = s; oi < e; ++oi) {
        const int64_t idx = order[oi].second;
        const float x = points[idx * 3], y = points[idx * 3 + 1],
                    z = points[idx * 3 + 2];
        float best[kK] = {FLT_MAX, FLT_MAX, FLT_MAX};

        auto consider = [&](int64_t oj) {
          if (oj == oi) return;
          const float* q = points + order[oj].second * 3;
          float dx = q[0] - x, dy = q[1] - y, dz = q[2] - z;
          float d2 = dx * dx + dy * dy + dz * dz;
          if (d2 < best[kK - 1]) {
            best[kK - 1] = d2;
            for (int t = kK - 1; t > 0 && best[t] < best[t - 1]; --t)
              std::swap(best[t], best[t - 1]);
          }
        };

        // scan the point's own (Morton-local) box first so the rejection
        // radius shrinks before visiting the rest; each box exactly once.
        const int64_t own = oi / kBoxSize;
        auto scan_box = [&](int64_t b) {
          if (box_dist2(boxes[b], x, y, z) > best[kK - 1]) return;
          int64_t endj = std::min<int64_t>((b + 1) * kBoxSize, n);
          for (int64_t oj = b * kBoxSize; oj < endj; ++oj) consider(oj);
        };
        scan_box(own);
        for (int64_t sb = 0; sb < num_super; ++sb) {
          if (box_dist2(supers[sb], x, y, z) > best[kK - 1]) continue;
          int64_t endb = std::min<int64_t>((sb + 1) * kSuper, num_boxes);
          for (int64_t b = sb * kSuper; b < endb; ++b)
            if (b != own) scan_box(b);
        }
        out[idx] = (best[0] + best[1] + best[2]) / 3.0f;
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
