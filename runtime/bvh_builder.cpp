// Native SAH BVH builder.
//
// Reference behavior: src/accelerators/bvh.cpp — centroid-sorted recursive
// build with 16-bucket SAH, flattened to a depth-first linear node array
// (bvh.cpp:88-115, flattenBVHTree :191). This builder emits the SoA arrays
// the TPU traversal consumes directly (node_lo/hi, second-child index,
// leaf count, axis, leaf-order prim permutation); the Python builder in
// pbrt_tpu/accel/bvh.py is the reference implementation / fallback.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kBuckets = 16;

struct BuildCtx {
  const float* lo;  // (n, 3)
  const float* hi;
  std::vector<double> cx, cy, cz;  // centroids
  float* node_lo;
  float* node_hi;
  int32_t* node_second;
  int32_t* node_count;
  int32_t* node_axis;
  int32_t* prim_order;
  int n_nodes = 0;
  int n_ordered = 0;
  int max_nodes = 0;
  int max_prims_in_node = 4;
  float traversal_cost = 0.125f;
};

inline double surface_area(const double b[6]) {
  double dx = std::max(0.0, b[3] - b[0]);
  double dy = std::max(0.0, b[4] - b[1]);
  double dz = std::max(0.0, b[5] - b[2]);
  return 2.0 * (dx * dy + dy * dz + dz * dx);
}

inline void grow(double b[6], const float* lo, const float* hi, int i) {
  b[0] = std::min(b[0], (double)lo[3 * i]);
  b[1] = std::min(b[1], (double)lo[3 * i + 1]);
  b[2] = std::min(b[2], (double)lo[3 * i + 2]);
  b[3] = std::max(b[3], (double)hi[3 * i]);
  b[4] = std::max(b[4], (double)hi[3 * i + 1]);
  b[5] = std::max(b[5], (double)hi[3 * i + 2]);
}

inline void reset(double b[6]) {
  b[0] = b[1] = b[2] = 1e300;
  b[3] = b[4] = b[5] = -1e300;
}

int build(BuildCtx& c, int* idx, int count) {
  if (c.n_nodes >= c.max_nodes) return -1;  // overflow (caller sized 2n)
  const int me = c.n_nodes++;
  double bounds[6];
  reset(bounds);
  for (int k = 0; k < count; ++k) grow(bounds, c.lo, c.hi, idx[k]);
  for (int a = 0; a < 3; ++a) {
    c.node_lo[3 * me + a] = (float)bounds[a];
    c.node_hi[3 * me + a] = (float)bounds[3 + a];
  }

  auto make_leaf = [&]() {
    c.node_second[me] = c.n_ordered;
    c.node_count[me] = count;
    c.node_axis[me] = 0;
    for (int k = 0; k < count; ++k) c.prim_order[c.n_ordered++] = idx[k];
    return me;
  };

  if (count <= 1) return make_leaf();

  // centroid bounds + split axis
  double clo[3] = {1e300, 1e300, 1e300}, chi[3] = {-1e300, -1e300, -1e300};
  const double* cs[3] = {c.cx.data(), c.cy.data(), c.cz.data()};
  for (int k = 0; k < count; ++k) {
    for (int a = 0; a < 3; ++a) {
      double v = cs[a][idx[k]];
      clo[a] = std::min(clo[a], v);
      chi[a] = std::max(chi[a], v);
    }
  }
  int axis = 0;
  double ext = chi[0] - clo[0];
  for (int a = 1; a < 3; ++a)
    if (chi[a] - clo[a] > ext) { ext = chi[a] - clo[a]; axis = a; }
  c.node_axis[me] = axis;
  if (ext < 1e-12) {
    // degenerate centroids: keep leaves bounded (the traversal unrolls
    // leaf tests statically over max_prims_in_node lanes)
    if (count <= c.max_prims_in_node) return make_leaf();
    int mid = count / 2;
    if (build(c, idx, mid) < 0) return -1;
    int second = build(c, idx + mid, count - mid);
    if (second < 0) return -1;
    c.node_second[me] = second;
    c.node_count[me] = 0;
    return me;
  }

  // 16-bucket binned SAH (reference: bvh.cpp:88-100)
  int counts[kBuckets] = {0};
  double bbounds[kBuckets][6];
  for (auto& b : bbounds) reset(b);
  std::vector<uint8_t> bucket_of(count);
  const double inv = kBuckets / ext;
  for (int k = 0; k < count; ++k) {
    int b = (int)((cs[axis][idx[k]] - clo[axis]) * inv);
    b = std::min(b, kBuckets - 1);
    bucket_of[k] = (uint8_t)b;
    counts[b]++;
    grow(bbounds[b], c.lo, c.hi, idx[k]);
  }
  // prefix/suffix sweeps
  double left_b[kBuckets][6], right_b[kBuckets][6];
  int left_n[kBuckets], right_n[kBuckets];
  double acc[6];
  reset(acc);
  int nacc = 0;
  for (int b = 0; b < kBuckets; ++b) {
    for (int a = 0; a < 3; ++a) {
      acc[a] = std::min(acc[a], bbounds[b][a]);
      acc[3 + a] = std::max(acc[3 + a], bbounds[b][3 + a]);
    }
    nacc += counts[b];
    std::memcpy(left_b[b], acc, sizeof(acc));
    left_n[b] = nacc;
  }
  reset(acc);
  nacc = 0;
  for (int b = kBuckets - 1; b >= 0; --b) {
    for (int a = 0; a < 3; ++a) {
      acc[a] = std::min(acc[a], bbounds[b][a]);
      acc[3 + a] = std::max(acc[3 + a], bbounds[b][3 + a]);
    }
    nacc += counts[b];
    std::memcpy(right_b[b], acc, sizeof(acc));
    right_n[b] = nacc;
  }
  const double sa_total = std::max(surface_area(bounds), 1e-300);
  int best = -1;
  double best_cost = 1e300;
  for (int b = 0; b < kBuckets - 1; ++b) {
    if (left_n[b] == 0 || right_n[b + 1] == 0) continue;
    double cost = c.traversal_cost +
                  (left_n[b] * surface_area(left_b[b]) +
                   right_n[b + 1] * surface_area(right_b[b + 1])) /
                      sa_total;
    if (cost < best_cost) { best_cost = cost; best = b; }
  }
  if (best < 0) {
    // all centroids in one bucket — median split
    if (count <= c.max_prims_in_node) return make_leaf();
    std::nth_element(idx, idx + count / 2, idx + count,
                     [&](int a, int b2) { return cs[axis][a] < cs[axis][b2]; });
    int mid = count / 2;
    if (build(c, idx, mid) < 0) return -1;
    int second = build(c, idx + mid, count - mid);
    if (second < 0) return -1;
    c.node_second[me] = second;
    c.node_count[me] = 0;
    return me;
  }
  if (count <= c.max_prims_in_node && (double)count <= best_cost)
    return make_leaf();

  // partition by bucket <= best (stable not required)
  std::vector<int> tmp(idx, idx + count);
  int w = 0;
  for (int k = 0; k < count; ++k)
    if (bucket_of[k] <= best) idx[w++] = tmp[k];
  int mid = w;
  for (int k = 0; k < count; ++k)
    if (bucket_of[k] > best) idx[w++] = tmp[k];
  if (mid == 0 || mid == count) mid = count / 2;

  if (build(c, idx, mid) < 0) return -1;
  int second = build(c, idx + mid, count - mid);
  if (second < 0) return -1;
  c.node_second[me] = second;
  c.node_count[me] = 0;
  return me;
}

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on overflow/error.
// Caller must size node arrays to at least 2*n and prim_order to n.
int pbrt_tpu_build_bvh(const float* lo, const float* hi, int n,
                       int max_prims_in_node, float traversal_cost,
                       float* node_lo, float* node_hi, int32_t* node_second,
                       int32_t* node_count, int32_t* node_axis,
                       int32_t* prim_order, int max_nodes) {
  if (n <= 0) return 0;
  BuildCtx c;
  c.lo = lo;
  c.hi = hi;
  c.cx.resize(n);
  c.cy.resize(n);
  c.cz.resize(n);
  for (int i = 0; i < n; ++i) {
    c.cx[i] = 0.5 * ((double)lo[3 * i] + hi[3 * i]);
    c.cy[i] = 0.5 * ((double)lo[3 * i + 1] + hi[3 * i + 1]);
    c.cz[i] = 0.5 * ((double)lo[3 * i + 2] + hi[3 * i + 2]);
  }
  c.node_lo = node_lo;
  c.node_hi = node_hi;
  c.node_second = node_second;
  c.node_count = node_count;
  c.node_axis = node_axis;
  c.prim_order = prim_order;
  c.max_nodes = max_nodes;
  c.max_prims_in_node = max_prims_in_node;
  c.traversal_cost = traversal_cost;
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  if (build(c, idx.data(), n) < 0) return -1;
  return c.n_nodes;
}

}  // extern "C"
