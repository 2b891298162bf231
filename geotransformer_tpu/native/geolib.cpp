// Native host preprocessing kernels for geotransformer_tpu.
//
// Replaces the reference's libtorch + nanoflann extension
// (/root/reference/geotransformer/extensions/) with a dependency-free C
// ABI consumed via ctypes:
//   * grid_subsample:   per-cloud voxel hashing, emits the mean of each
//     occupied voxel ordered by flat voxel id (bit-identical to the numpy
//     path in preprocess/voxel.py, which sorts by the same id).
//   * radius_neighbors: fixed-K nearest-within-radius search over a uniform
//     grid hash (cell = radius), sorted by (distance, index) so results are
//     fully deterministic; sentinel index = total support count.
//
// Single-threaded per call by design: the input pipeline parallelizes over
// pairs with worker processes.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelAccum {
  double x = 0.0, y = 0.0, z = 0.0;
  int64_t count = 0;
};

}  // namespace

extern "C" {

// Subsample one stacked batch of clouds. Returns the total number of output
// points, or -1 if out_capacity would be exceeded (caller retries bigger).
int64_t gt_grid_subsample(const float* points, const int64_t* lengths,
                          int64_t batch, double voxel_size, float* out_points,
                          int64_t out_capacity, int64_t* out_lengths) {
  int64_t start = 0;
  int64_t total_out = 0;
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t n = lengths[b];
    const float* cloud = points + 3 * start;

    double min_c[3] = {1e30, 1e30, 1e30};
    double max_c[3] = {-1e30, -1e30, -1e30};
    for (int64_t i = 0; i < n; ++i) {
      for (int d = 0; d < 3; ++d) {
        const double v = cloud[3 * i + d];
        min_c[d] = std::min(min_c[d], v);
        max_c[d] = std::max(max_c[d], v);
      }
    }
    double origin[3];
    for (int d = 0; d < 3; ++d) {
      origin[d] = std::floor(min_c[d] / voxel_size) * voxel_size;
    }
    const int64_t nx =
        static_cast<int64_t>(std::floor((max_c[0] - origin[0]) / voxel_size)) + 1;
    const int64_t ny =
        static_cast<int64_t>(std::floor((max_c[1] - origin[1]) / voxel_size)) + 1;

    std::unordered_map<int64_t, VoxelAccum> voxels;
    voxels.reserve(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) {
      const double x = cloud[3 * i + 0];
      const double y = cloud[3 * i + 1];
      const double z = cloud[3 * i + 2];
      const int64_t ix = static_cast<int64_t>(std::floor((x - origin[0]) / voxel_size));
      const int64_t iy = static_cast<int64_t>(std::floor((y - origin[1]) / voxel_size));
      const int64_t iz = static_cast<int64_t>(std::floor((z - origin[2]) / voxel_size));
      VoxelAccum& acc = voxels[ix + nx * iy + nx * ny * iz];
      acc.x += x;
      acc.y += y;
      acc.z += z;
      acc.count += 1;
    }

    std::vector<std::pair<int64_t, const VoxelAccum*>> ordered;
    ordered.reserve(voxels.size());
    for (const auto& kv : voxels) ordered.emplace_back(kv.first, &kv.second);
    std::sort(ordered.begin(), ordered.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });

    if (total_out + static_cast<int64_t>(ordered.size()) > out_capacity) return -1;
    for (const auto& kv : ordered) {
      const VoxelAccum& acc = *kv.second;
      out_points[3 * total_out + 0] = static_cast<float>(acc.x / acc.count);
      out_points[3 * total_out + 1] = static_cast<float>(acc.y / acc.count);
      out_points[3 * total_out + 2] = static_cast<float>(acc.z / acc.count);
      ++total_out;
    }
    out_lengths[b] = static_cast<int64_t>(ordered.size());
    start += n;
  }
  return total_out;
}

// Fixed-K radius search in stack mode; out_indices is (total_q, limit),
// sentinel = total_s for missing slots.
void gt_radius_neighbors(const float* q_points, const float* s_points,
                         const int64_t* q_lengths, const int64_t* s_lengths,
                         int64_t batch, double radius, int64_t limit,
                         int64_t* out_indices) {
  int64_t total_s = 0;
  for (int64_t b = 0; b < batch; ++b) total_s += s_lengths[b];

  const double r2 = radius * radius;
  int64_t q_start = 0;
  int64_t s_start = 0;
  std::vector<std::pair<float, int64_t>> cand;
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t nq = q_lengths[b];
    const int64_t ns = s_lengths[b];
    const float* q = q_points + 3 * q_start;
    const float* s = s_points + 3 * s_start;

    // uniform grid over the support cloud, cell edge = radius
    double min_c[3] = {1e30, 1e30, 1e30};
    for (int64_t i = 0; i < ns; ++i) {
      for (int d = 0; d < 3; ++d) min_c[d] = std::min(min_c[d], (double)s[3 * i + d]);
    }
    auto cell_of = [&](const float* p) {
      int64_t c[3];
      for (int d = 0; d < 3; ++d) {
        c[d] = static_cast<int64_t>(std::floor((p[d] - min_c[d]) / radius));
      }
      return std::array<int64_t, 3>{c[0], c[1], c[2]};
    };
    auto key_of = [](int64_t cx, int64_t cy, int64_t cz) {
      // interleave-free 3D key; clouds are far smaller than 2^21 cells/axis
      return ((cx + (1 << 20)) << 42) | ((cy + (1 << 20)) << 21) | (cz + (1 << 20));
    };
    std::unordered_map<int64_t, std::vector<int64_t>> grid;
    grid.reserve(static_cast<size_t>(ns));
    for (int64_t i = 0; i < ns; ++i) {
      const auto c = cell_of(s + 3 * i);
      grid[key_of(c[0], c[1], c[2])].push_back(i);
    }

    for (int64_t i = 0; i < nq; ++i) {
      const float* qp = q + 3 * i;
      const auto c = cell_of(qp);
      cand.clear();
      for (int64_t dx = -1; dx <= 1; ++dx) {
        for (int64_t dy = -1; dy <= 1; ++dy) {
          for (int64_t dz = -1; dz <= 1; ++dz) {
            auto it = grid.find(key_of(c[0] + dx, c[1] + dy, c[2] + dz));
            if (it == grid.end()) continue;
            for (int64_t j : it->second) {
              const double ddx = qp[0] - s[3 * j + 0];
              const double ddy = qp[1] - s[3 * j + 1];
              const double ddz = qp[2] - s[3 * j + 2];
              const double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
              if (d2 <= r2) cand.emplace_back(static_cast<float>(d2), j);
            }
          }
        }
      }
      const int64_t k = std::min<int64_t>(limit, cand.size());
      std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
      int64_t* row = out_indices + (q_start + i) * limit;
      for (int64_t j = 0; j < k; ++j) row[j] = cand[j].second + s_start;
      for (int64_t j = k; j < limit; ++j) row[j] = total_s;
    }
    q_start += nq;
    s_start += ns;
  }
}

}  // extern "C"
