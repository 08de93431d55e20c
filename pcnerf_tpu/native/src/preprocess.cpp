// Native preprocessing core: iterative plane-fit ground filtering and
// radius region-growing clustering.
//
// TPU-native replacements for the reference's ROS/PCL node
// (data_preprocess/scripts/tool_ws/src/plane_fit_ground_filter/src/
// plane_ground_filter_core.cpp) and the Open3D KDTree clustering script
// (data_preprocess/scripts/no_ground_cluster_kitti.py) — same algorithms,
// no ROS/PCL/Open3D dependency, exposed over a C ABI for ctypes.
//
// Build: python -m pcnerf_tpu.native.build

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Eigenvector of the smallest eigenvalue of a symmetric 3x3 matrix via
// cyclic Jacobi rotations (replaces Eigen::JacobiSVD on the covariance,
// plane_ground_filter_core.cpp:118-138).
void smallest_eigvec(double a[3][3], double out[3]) {
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  int mi = 0;
  if (a[1][1] < a[mi][mi]) mi = 1;
  if (a[2][2] < a[mi][mi]) mi = 2;
  for (int k = 0; k < 3; ++k) out[k] = v[k][mi];
}

struct CellKey {
  int64_t x, y, z;
  bool operator==(const CellKey& o) const { return x == o.x && y == o.y && z == o.z; }
};
struct CellHash {
  size_t operator()(const CellKey& k) const {
    return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
  }
};

}  // namespace

extern "C" {

// Iterative plane-fit ground segmentation.
//
// Mirrors plane_ground_filter_core.cpp:point_cb (:183-258): z-sort, drop
// points below -1.5*sensor_height, seed from the num_lpr lowest points
// (z < lpr_mean + th_seeds), then num_iter rounds of {plane fit on current
// ground set; re-classify ALL points by signed plane distance < th_dist}.
// ground_mask gets the final classification; noground_mask additionally
// applies the post-process crops (clip_above + min/max planar distance,
// :65-103, :174-181).
void pcnerf_ground_filter(const float* pts, int64_t n, int num_iter,
                          int num_lpr, float th_seeds, float th_dist,
                          float sensor_height, float clip_height,
                          float min_distance, float max_distance,
                          uint8_t* ground_mask, uint8_t* noground_mask) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return pts[3 * a + 2] < pts[3 * b + 2];
  });
  // error-point removal: skip z < -1.5 * sensor_height
  size_t start = 0;
  while (start < order.size() && pts[3 * order[start] + 2] < -1.5f * sensor_height)
    ++start;

  // initial seeds
  double lpr = 0.0;
  int cnt = 0;
  for (size_t i = start; i < order.size() && cnt < num_lpr; ++i, ++cnt)
    lpr += pts[3 * order[i] + 2];
  if (cnt) lpr /= cnt;
  std::vector<int64_t> ground;
  for (size_t i = start; i < order.size(); ++i)
    if (pts[3 * order[i] + 2] < lpr + th_seeds) ground.push_back(order[i]);

  std::vector<uint8_t> is_ground(n, 0);
  for (int it = 0; it < num_iter; ++it) {
    // mean + covariance of current ground set
    double mean[3] = {0, 0, 0};
    for (int64_t idx : ground)
      for (int k = 0; k < 3; ++k) mean[k] += pts[3 * idx + k];
    int64_t m = static_cast<int64_t>(ground.size());
    if (m == 0) break;
    for (int k = 0; k < 3; ++k) mean[k] /= m;
    double cov[3][3] = {{0}};
    for (int64_t idx : ground) {
      double d[3] = {pts[3 * idx] - mean[0], pts[3 * idx + 1] - mean[1],
                     pts[3 * idx + 2] - mean[2]};
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) cov[r][c] += d[r] * d[c];
    }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) cov[r][c] /= m;
    double normal[3];
    smallest_eigvec(cov, normal);
    double d_plane = -(normal[0] * mean[0] + normal[1] * mean[1] + normal[2] * mean[2]);
    double th = th_dist - d_plane;

    ground.clear();
    for (int64_t i = 0; i < n; ++i) {
      double r = normal[0] * pts[3 * i] + normal[1] * pts[3 * i + 1] +
                 normal[2] * pts[3 * i + 2];
      is_ground[i] = r < th ? 1 : 0;
      if (is_ground[i]) ground.push_back(i);
    }
  }

  for (int64_t i = 0; i < n; ++i) {
    ground_mask[i] = is_ground[i];
    if (is_ground[i]) {
      noground_mask[i] = 0;
    } else {
      float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
      float dist = std::sqrt(x * x + y * y);
      noground_mask[i] =
          (z <= clip_height && dist >= min_distance && dist <= max_distance) ? 1 : 0;
    }
  }
}

// Radius region-growing clustering via grid-hash BFS.
//
// Same connectivity as no_ground_cluster_kitti.py:region_growing_segmentation
// (radius-graph connected components; a cluster is kept iff its size lies in
// [min_cluster, n]).  labels: cluster index (0-based, ordered by the cluster's
// first point index == BFS discovery order) for kept clusters, -1 otherwise.
// Returns the number of kept clusters.
int64_t pcnerf_region_grow(const float* pts, int64_t n, float radius,
                           int64_t min_cluster, int32_t* labels) {
  const double cell = radius;
  std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
  grid.reserve(static_cast<size_t>(n / 2 + 16));
  auto key_of = [&](int64_t i) {
    return CellKey{static_cast<int64_t>(std::floor(pts[3 * i] / cell)),
                   static_cast<int64_t>(std::floor(pts[3 * i + 1] / cell)),
                   static_cast<int64_t>(std::floor(pts[3 * i + 2] / cell))};
  };
  for (int64_t i = 0; i < n; ++i) grid[key_of(i)].push_back(i);

  std::vector<uint8_t> visited(n, 0);
  std::vector<int64_t> stack, cluster;
  const double r2 = static_cast<double>(radius) * radius;
  int64_t n_clusters = 0;
  for (int64_t i = 0; i < n; ++i) labels[i] = -1;

  for (int64_t s = 0; s < n; ++s) {
    if (visited[s]) continue;
    visited[s] = 1;
    cluster.clear();
    stack.clear();
    stack.push_back(s);
    while (!stack.empty()) {
      int64_t cur = stack.back();
      stack.pop_back();
      cluster.push_back(cur);
      CellKey ck = key_of(cur);
      for (int64_t dx = -1; dx <= 1; ++dx)
        for (int64_t dy = -1; dy <= 1; ++dy)
          for (int64_t dz = -1; dz <= 1; ++dz) {
            auto it = grid.find(CellKey{ck.x + dx, ck.y + dy, ck.z + dz});
            if (it == grid.end()) continue;
            for (int64_t j : it->second) {
              if (visited[j]) continue;
              double ddx = pts[3 * cur] - pts[3 * j];
              double ddy = pts[3 * cur + 1] - pts[3 * j + 1];
              double ddz = pts[3 * cur + 2] - pts[3 * j + 2];
              if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
                visited[j] = 1;
                stack.push_back(j);
              }
            }
          }
    }
    if (static_cast<int64_t>(cluster.size()) >= min_cluster) {
      for (int64_t idx : cluster) labels[idx] = static_cast<int32_t>(n_clusters);
      ++n_clusters;
    }
  }
  return n_clusters;
}

// Brute-force exact nearest-neighbor distances from each query to a target
// set, gridded.  Used by the offline metrics fallback when no accelerator is
// attached (the on-device path lives in pcnerf_tpu/eval/metrics.py).
void pcnerf_nn_distances(const float* target, int64_t nt, const float* query,
                         int64_t nq, float cell, float* out_dist) {
  std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
  grid.reserve(static_cast<size_t>(nt / 2 + 16));
  auto key_of = [&](const float* p) {
    return CellKey{static_cast<int64_t>(std::floor(p[0] / cell)),
                   static_cast<int64_t>(std::floor(p[1] / cell)),
                   static_cast<int64_t>(std::floor(p[2] / cell))};
  };
  for (int64_t i = 0; i < nt; ++i) grid[key_of(target + 3 * i)].push_back(i);

  for (int64_t q = 0; q < nq; ++q) {
    const float* p = query + 3 * q;
    CellKey ck = key_of(p);
    double best = 1e30;
    // expand Chebyshev rings; a ring-r cell is at least (r-1)*cell away, so
    // once that lower bound exceeds the best hit the search is exact
    for (int64_t ring = 0; ring <= 1 << 20; ++ring) {
      double ring_min = (ring > 0 ? (ring - 1) * static_cast<double>(cell) : 0.0);
      if (best < 1e29 && ring_min * ring_min > best) break;
      for (int64_t dx = -ring; dx <= ring; ++dx)
        for (int64_t dy = -ring; dy <= ring; ++dy)
          for (int64_t dz = -ring; dz <= ring; ++dz) {
            if (std::max({std::abs(dx), std::abs(dy), std::abs(dz)}) != ring)
              continue;
            auto it = grid.find(CellKey{ck.x + dx, ck.y + dy, ck.z + dz});
            if (it == grid.end()) continue;
            for (int64_t j : it->second) {
              double ddx = p[0] - target[3 * j];
              double ddy = p[1] - target[3 * j + 1];
              double ddz = p[2] - target[3 * j + 2];
              double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
              if (d2 < best) best = d2;
            }
          }
    }
    out_dist[q] = static_cast<float>(std::sqrt(best));
  }
}

}  // extern "C"
