// Native KD-tree builder: C++ implementation of the host-side build
// (semantics of reference create_kd_tree.cuh:162-328, re-derived -- see
// accel/kdtree.py for the algorithm oracle; this produces bit-identical
// output and is the production path for multi-million-triangle scenes).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libkdbuild.so)

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Builder {
  // per-triangle precomputed bounds/centroids along each axis
  const float* tmin;  // (n, 3)
  const float* tmax;  // (n, 3)
  std::vector<float> mid;  // (n, 3)

  int max_depth;
  int leaf_size;

  std::vector<int32_t> child_a, child_b, axis_v;
  std::vector<float> plane_v;
  std::vector<uint8_t> leaf_v;
  std::vector<int32_t> indices;

  int32_t new_node() {
    child_a.push_back(0);
    child_b.push_back(0);
    axis_v.push_back(0);
    plane_v.push_back(0.0f);
    leaf_v.push_back(0);
    return static_cast<int32_t>(child_a.size()) - 1;
  }

  int32_t add_leaf(const std::vector<int32_t>& ids) {
    int32_t node = new_node();
    leaf_v[node] = 1;
    child_a[node] = static_cast<int32_t>(indices.size());
    child_b[node] = static_cast<int32_t>(ids.size());
    indices.insert(indices.end(), ids.begin(), ids.end());
    return node;
  }

  // Median of centroid values: sorted order, element [n/2]
  // (create_kd_tree.cuh:125-160).
  float plane_offset(const std::vector<int32_t>& ids, int ax) {
    std::vector<float> vals(ids.size());
    for (size_t i = 0; i < ids.size(); ++i) vals[i] = mid[ids[i] * 3 + ax];
    size_t k = vals.size() / 2;
    std::nth_element(vals.begin(), vals.begin() + k, vals.end());
    return vals[k];
  }

  void split(int32_t node, std::vector<int32_t>& ids, int depth) {
    int ax = depth % 3;
    float plane = plane_offset(ids, ax);
    axis_v[node] = ax;
    plane_v[node] = plane;

    // Straddlers go to BOTH children (create_kd_tree.cuh:59-123).
    std::vector<int32_t> behind, afore;
    behind.reserve(ids.size());
    afore.reserve(ids.size());
    for (int32_t id : ids) {
      if (tmin[id * 3 + ax] <= plane) behind.push_back(id);
      if (tmax[id * 3 + ax] >= plane) afore.push_back(id);
    }
    { std::vector<int32_t>().swap(ids); }  // release parent memory pre-recursion

    for (int which = 0; which < 2; ++which) {
      std::vector<int32_t>& child_ids = which == 0 ? behind : afore;
      int32_t child;
      if (static_cast<int>(child_ids.size()) > leaf_size && depth < max_depth) {
        child = new_node();
        if (which == 0) child_a[node] = child; else child_b[node] = child;
        split(child, child_ids, depth + 1);
      } else {
        child = add_leaf(child_ids);
        if (which == 0) child_a[node] = child; else child_b[node] = child;
      }
    }
  }
};

}  // namespace

extern "C" {

struct KDResult {
  int32_t* child_a;
  int32_t* child_b;
  int32_t* axis;
  float* plane;
  uint8_t* is_leaf;
  int64_t n_nodes;
  int32_t* tri_indices;
  int64_t n_indices;
  float bbox_min[3];
  float bbox_max[3];
};

// vertices: (n, 3, 3) float32 row-major triangle corners.
KDResult* kd_build(const float* vertices, int64_t n, int max_depth,
                   int leaf_size) {
  Builder b;
  std::vector<float> tmin(n * 3), tmax(n * 3);
  b.mid.resize(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    for (int ax = 0; ax < 3; ++ax) {
      float a = vertices[i * 9 + 0 * 3 + ax];
      float c = vertices[i * 9 + 1 * 3 + ax];
      float d = vertices[i * 9 + 2 * 3 + ax];
      float lo = std::min(a, std::min(c, d));
      float hi = std::max(a, std::max(c, d));
      tmin[i * 3 + ax] = lo;
      tmax[i * 3 + ax] = hi;
      b.mid[i * 3 + ax] = (lo + hi) * 0.5f;
    }
  }
  b.tmin = tmin.data();
  b.tmax = tmax.data();
  b.max_depth = max_depth;
  b.leaf_size = leaf_size;

  int32_t root = b.new_node();
  std::vector<int32_t> all(n);
  for (int64_t i = 0; i < n; ++i) all[i] = static_cast<int32_t>(i);
  b.split(root, all, 0);

  KDResult* r = new KDResult;
  auto copy_i32 = [](const std::vector<int32_t>& v) {
    int32_t* p = static_cast<int32_t*>(std::malloc(v.size() * 4));
    std::memcpy(p, v.data(), v.size() * 4);
    return p;
  };
  r->n_nodes = static_cast<int64_t>(b.child_a.size());
  r->child_a = copy_i32(b.child_a);
  r->child_b = copy_i32(b.child_b);
  r->axis = copy_i32(b.axis_v);
  r->plane = static_cast<float*>(std::malloc(b.plane_v.size() * 4));
  std::memcpy(r->plane, b.plane_v.data(), b.plane_v.size() * 4);
  r->is_leaf = static_cast<uint8_t*>(std::malloc(b.leaf_v.size()));
  std::memcpy(r->is_leaf, b.leaf_v.data(), b.leaf_v.size());
  r->n_indices = static_cast<int64_t>(b.indices.size());
  r->tri_indices = copy_i32(b.indices);

  const float eps = 0.01f;  // create_kd_tree.cuh:20
  for (int ax = 0; ax < 3; ++ax) {
    float lo = tmin[ax], hi = tmax[ax];
    for (int64_t i = 1; i < n; ++i) {
      lo = std::min(lo, tmin[i * 3 + ax]);
      hi = std::max(hi, tmax[i * 3 + ax]);
    }
    r->bbox_min[ax] = lo - eps;
    r->bbox_max[ax] = hi + eps;
  }
  return r;
}

void kd_free(KDResult* r) {
  if (!r) return;
  std::free(r->child_a);
  std::free(r->child_b);
  std::free(r->axis);
  std::free(r->plane);
  std::free(r->is_leaf);
  std::free(r->tri_indices);
  delete r;
}

}  // extern "C"
