// Native host-side point-cloud kernels for street_gaussians_tpu.
//
// TPU-native counterpart of the reference's init-time native components:
//   * knn_mean_sq_dist3: mean squared distance to the 3 nearest
//     neighbors per point — the capability of simple_knn._C.distCUDA2
//     (ref: submodules/simple-knn/simple_knn.cu:147-183, used at
//     lib/models/gaussian_model.py:63). Same algorithmic idea as the
//     reference (Morton-order sort + windowed candidate scan + box
//     pruning) but written for multicore CPU (OpenMP) since model init
//     is host-side here.
//   * voxel_downsample / radius_outlier_counts: the open3d calls of the
//     background-cloud build (ref: lib/utils/waymo_utils.py:553-561).
//
// Exposed as a plain C ABI for ctypes; built by street_gaussians_tpu/native.py.

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct MinMax {
  float mn[3];
  float mx[3];
};

MinMax bounds(const float* pts, int64_t n) {
  MinMax b;
  for (int d = 0; d < 3; ++d) {
    b.mn[d] = FLT_MAX;
    b.mx[d] = -FLT_MAX;
  }
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      b.mn[d] = std::min(b.mn[d], pts[3 * i + d]);
      b.mx[d] = std::max(b.mx[d], pts[3 * i + d]);
    }
  }
  return b;
}

// 30-bit Morton code (10 bits/axis), like simple_knn.cu:45-70.
inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

inline uint32_t morton(const float* p, const MinMax& b) {
  uint32_t code = 0;
  for (int d = 0; d < 3; ++d) {
    float range = std::max(b.mx[d] - b.mn[d], 1e-12f);
    float x = (p[d] - b.mn[d]) / range;
    uint32_t xi = (uint32_t)std::min(std::max(x * 1023.0f, 0.0f), 1023.0f);
    code |= expand_bits(xi) << (2 - d);
  }
  return code;
}

struct Box {
  float mn[3], mx[3];
};

inline float box_dist_sq(const Box& box, const float* p) {
  float d2 = 0.f;
  for (int d = 0; d < 3; ++d) {
    float diff = 0.f;
    if (p[d] < box.mn[d]) diff = box.mn[d] - p[d];
    else if (p[d] > box.mx[d]) diff = p[d] - box.mx[d];
    d2 += diff * diff;
  }
  return d2;
}

inline void update_k3(float d2, float* best) {
  if (d2 < best[2]) {
    best[2] = d2;
    if (best[2] < best[1]) std::swap(best[1], best[2]);
    if (best[1] < best[0]) std::swap(best[0], best[1]);
  }
}

struct VoxelKey {
  int64_t x, y, z;
  bool operator==(const VoxelKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct VoxelHash {
  size_t operator()(const VoxelKey& k) const {
    size_t h = (size_t)k.x * 73856093u ^ (size_t)k.y * 19349663u ^
               (size_t)k.z * 83492791u;
    return h;
  }
};

}  // namespace

extern "C" {

// out[i] = mean squared distance from point i to its 3 nearest neighbors.
void knn_mean_sq_dist3(const float* pts, int64_t n, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 1e-7f;
    return;
  }
  MinMax b = bounds(pts, n);

  std::vector<std::pair<uint32_t, int64_t>> order(n);
  for (int64_t i = 0; i < n; ++i)
    order[i] = {morton(pts + 3 * i, b), i};
  std::sort(order.begin(), order.end());

  std::vector<float> sorted(3 * n);
  for (int64_t i = 0; i < n; ++i)
    std::memcpy(&sorted[3 * i], pts + 3 * order[i].second, 12);

  // 1024-point boxes with AABBs (simple_knn.cu:78-117)
  const int64_t BOX = 1024;
  int64_t nboxes = (n + BOX - 1) / BOX;
  std::vector<Box> boxes(nboxes);
  for (int64_t bi = 0; bi < nboxes; ++bi) {
    Box& box = boxes[bi];
    for (int d = 0; d < 3; ++d) {
      box.mn[d] = FLT_MAX;
      box.mx[d] = -FLT_MAX;
    }
    for (int64_t i = bi * BOX; i < std::min((bi + 1) * BOX, n); ++i)
      for (int d = 0; d < 3; ++d) {
        box.mn[d] = std::min(box.mn[d], sorted[3 * i + d]);
        box.mx[d] = std::max(box.mx[d], sorted[3 * i + d]);
      }
  }

#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    const float* p = &sorted[3 * i];
    float best[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    // pass 1: +-3 neighbors in Morton order (simple_knn.cu:147-160)
    for (int64_t j = std::max<int64_t>(0, i - 3);
         j <= std::min(n - 1, i + 3); ++j) {
      if (j == i) continue;
      float dx = sorted[3 * j] - p[0];
      float dy = sorted[3 * j + 1] - p[1];
      float dz = sorted[3 * j + 2] - p[2];
      update_k3(dx * dx + dy * dy + dz * dz, best);
    }
    // pass 2: box-pruned scan (simple_knn.cu:161-183). Unlike the
    // reference, the Morton-window candidates of pass 1 are skipped so
    // no neighbor is inserted twice (the CUDA version double-counts,
    // biasing scales slightly low; here the result is exact 3-NN).
    float reject = best[2];
    for (int64_t bi = 0; bi < nboxes; ++bi) {
      if (box_dist_sq(boxes[bi], p) > reject) continue;
      for (int64_t j = bi * BOX; j < std::min((bi + 1) * BOX, n); ++j) {
        if (j >= i - 3 && j <= i + 3) continue;
        float dx = sorted[3 * j] - p[0];
        float dy = sorted[3 * j + 1] - p[1];
        float dz = sorted[3 * j + 2] - p[2];
        update_k3(dx * dx + dy * dy + dz * dz, best);
      }
      reject = best[2];
    }
    out[order[i].second] = (best[0] + best[1] + best[2]) / 3.0f;
  }
}

// Voxel-average downsampling. Returns number of output points; caller
// provides out buffers of size >= n. Two-call style not needed since
// n_out <= n.
int64_t voxel_downsample(const float* pts, const float* rgb, int64_t n,
                         float voxel, float* out_pts, float* out_rgb) {
  std::unordered_map<VoxelKey, int64_t, VoxelHash> map;
  map.reserve((size_t)n);
  std::vector<double> acc;  // 6 per voxel
  std::vector<int64_t> cnt;
  for (int64_t i = 0; i < n; ++i) {
    VoxelKey k{(int64_t)std::floor(pts[3 * i] / voxel),
               (int64_t)std::floor(pts[3 * i + 1] / voxel),
               (int64_t)std::floor(pts[3 * i + 2] / voxel)};
    auto it = map.find(k);
    int64_t idx;
    if (it == map.end()) {
      idx = (int64_t)cnt.size();
      map.emplace(k, idx);
      acc.resize(acc.size() + 6, 0.0);
      cnt.push_back(0);
    } else {
      idx = it->second;
    }
    for (int d = 0; d < 3; ++d) {
      acc[6 * idx + d] += pts[3 * i + d];
      acc[6 * idx + 3 + d] += rgb[3 * i + d];
    }
    cnt[idx]++;
  }
  int64_t m = (int64_t)cnt.size();
  for (int64_t v = 0; v < m; ++v)
    for (int d = 0; d < 3; ++d) {
      out_pts[3 * v + d] = (float)(acc[6 * v + d] / cnt[v]);
      out_rgb[3 * v + d] = (float)(acc[6 * v + 3 + d] / cnt[v]);
    }
  return m;
}

// counts[i] = number of points (including i) within `radius` of point i.
void radius_outlier_counts(const float* pts, int64_t n, float radius,
                           int32_t* counts) {
  float cell = radius;
  std::unordered_map<VoxelKey, std::vector<int32_t>, VoxelHash> grid;
  grid.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    VoxelKey k{(int64_t)std::floor(pts[3 * i] / cell),
               (int64_t)std::floor(pts[3 * i + 1] / cell),
               (int64_t)std::floor(pts[3 * i + 2] / cell)};
    grid[k].push_back((int32_t)i);
  }
  float r2 = radius * radius;
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    VoxelKey k{(int64_t)std::floor(pts[3 * i] / cell),
               (int64_t)std::floor(pts[3 * i + 1] / cell),
               (int64_t)std::floor(pts[3 * i + 2] / cell)};
    int32_t c = 0;
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          auto it = grid.find(VoxelKey{k.x + dx, k.y + dy, k.z + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            float ddx = pts[3 * j] - pts[3 * i];
            float ddy = pts[3 * j + 1] - pts[3 * i + 1];
            float ddz = pts[3 * j + 2] - pts[3 * i + 2];
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) ++c;
          }
        }
    counts[i] = c;
  }
}

}  // extern "C"
