// Native BVH8 builder: binned-SAH binary build + 8-wide collapse into the
// fat-row layout consumed by ops/traversal8.py.
//
// TPU-native counterpart of the reference's SplitBVHBuilder (object splits;
// spatial splits can be layered on the same bin machinery). Exposed via a C
// ABI for ctypes; multithreaded at the top of the tree via std::async.
//
// Row layouts (128 f32 per row, see scene/bvh8.py):
//   node: lo_x[8] lo_y[8] lo_z[8] hi_x[8] hi_y[8] hi_z[8] links[8-as-f32]
//   leaf: v0x[12] v0y[12] v0z[12] e1x... e2z (108), ids[12-as-f32], count
// link >= 0: node row; link == -1: empty; link <= -2: leaf row (-2 - idx).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <future>
#include <mutex>
#include <vector>

namespace {

constexpr int kBins = 16;
constexpr int kLeafTris = 12;
constexpr int kWidth = 8;

struct V3 {
  float x, y, z;
  V3() : x(0), y(0), z(0) {}
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
};
static inline V3 vmin(const V3 &a, const V3 &b) {
  return V3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
static inline V3 vmax(const V3 &a, const V3 &b) {
  return V3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct AABB {
  V3 lo{1e30f, 1e30f, 1e30f};
  V3 hi{-1e30f, -1e30f, -1e30f};
  void grow(const AABB &o) { lo = vmin(lo, o.lo); hi = vmax(hi, o.hi); }
  void grow(const V3 &p) { lo = vmin(lo, p); hi = vmax(hi, p); }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f), dy = std::max(hi.y - lo.y, 0.f),
          dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
  V3 center() const {
    return V3(0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y), 0.5f * (lo.z + hi.z));
  }
};

struct BuildCtx {
  const float *v0, *v1, *v2;
  std::vector<AABB> boxes;
  std::vector<V3> centers;
  std::vector<int32_t> order;
};

// binary-tree node produced by the SAH build
struct BNode {
  AABB bounds;
  int32_t left = -1, right = -1;  // indices into the node pool
  int32_t first = 0, count = 0;   // leaf range when left < 0
};

struct Pool {
  std::vector<BNode> nodes;
  std::mutex mtx;
  int32_t alloc() {
    std::lock_guard<std::mutex> g(mtx);
    int32_t i = (int32_t)nodes.size();
    nodes.resize(i + 1);
    return i;
  }
};

static AABB range_bounds(BuildCtx &c, int s, int e) {
  AABB b;
  for (int i = s; i < e; ++i) b.grow(c.boxes[c.order[i]]);
  return b;
}

static int32_t build_range(BuildCtx &c, Pool &pool, int s, int e,
                           const AABB &bounds, int depth, int par_depth);

// returns index of a BNode describing [s, e)
static void build_children(BuildCtx &c, Pool &pool, BNode &out, int s, int e,
                           const AABB &bounds, int depth, int par_depth) {
  out.bounds = bounds;
  int n = e - s;
  if (n <= kLeafTris) {
    out.left = -1;
    out.first = s;
    out.count = n;
    return;
  }
  // centroid bounds + widest axis
  AABB cb;
  for (int i = s; i < e; ++i) cb.grow(c.centers[c.order[i]]);
  float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
  int axis = ext[1] > ext[0] ? 1 : 0;
  if (ext[2] > ext[axis]) axis = 2;
  int mid;
  if (ext[axis] < 1e-12f) {
    mid = s + n / 2;  // degenerate: median
  } else {
    float lo_a = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
    float scale = kBins * (1.f - 1e-6f) / ext[axis];
    AABB bb[kBins];
    int cnt[kBins] = {0};
    for (int i = s; i < e; ++i) {
      const V3 &ce = c.centers[c.order[i]];
      float v = axis == 0 ? ce.x : (axis == 1 ? ce.y : ce.z);
      int b = (int)((v - lo_a) * scale);
      bb[b].grow(c.boxes[c.order[i]]);
      cnt[b]++;
    }
    AABB lft[kBins], rgt[kBins];
    int lc[kBins], rc[kBins];
    AABB acc;
    int ac = 0;
    for (int b = 0; b < kBins; ++b) {
      acc.grow(bb[b]); ac += cnt[b]; lft[b] = acc; lc[b] = ac;
    }
    acc = AABB(); ac = 0;
    for (int b = kBins - 1; b >= 0; --b) {
      acc.grow(bb[b]); ac += cnt[b]; rgt[b] = acc; rc[b] = ac;
    }
    float best_cost = 1e30f;
    int best = -1;
    for (int b = 0; b < kBins - 1; ++b) {
      if (lc[b] == 0 || rc[b + 1] == 0) continue;
      float cost = lft[b].area() * lc[b] + rgt[b + 1].area() * rc[b + 1];
      if (cost < best_cost) { best_cost = cost; best = b; }
    }
    if (best < 0) {
      mid = s + n / 2;
    } else {
      // partition by bin
      float lo_b = lo_a;
      auto bin_of = [&](int32_t t) {
        const V3 &ce = c.centers[t];
        float v = axis == 0 ? ce.x : (axis == 1 ? ce.y : ce.z);
        return (int)((v - lo_b) * scale);
      };
      int i = s, j = e - 1;
      while (i <= j) {
        if (bin_of(c.order[i]) <= best) { ++i; }
        else { std::swap(c.order[i], c.order[j]); --j; }
      }
      mid = i;
      if (mid == s || mid == e) mid = s + n / 2;
    }
  }
  AABB lb = range_bounds(c, s, mid), rb = range_bounds(c, mid, e);
  if (depth < par_depth) {
    auto rfut = std::async(std::launch::async, [&]() {
      return build_range(c, pool, mid, e, rb, depth + 1, par_depth);
    });
    out.left = build_range(c, pool, s, mid, lb, depth + 1, par_depth);
    out.right = rfut.get();
  } else {
    out.left = build_range(c, pool, s, mid, lb, depth + 1, par_depth);
    out.right = build_range(c, pool, mid, e, rb, depth + 1, par_depth);
  }
}

static int32_t build_range(BuildCtx &c, Pool &pool, int s, int e,
                           const AABB &bounds, int depth, int par_depth) {
  int32_t idx = pool.alloc();
  BNode local;
  build_children(c, pool, local, s, e, bounds, depth, par_depth);
  pool.nodes[idx] = local;
  return idx;
}

// ---------------- collapse to 8-wide fat rows ----------------

struct Emit {
  std::vector<float> nodes;   // rows of 128
  std::vector<float> leaves;  // rows of 128
  BuildCtx *c;
  Pool *pool;

  int32_t emit_leaf(int first, int count) {
    size_t base = leaves.size();
    leaves.resize(base + 128, 0.f);
    float *row = &leaves[base];
    int32_t ids[kLeafTris];
    for (int k = 0; k < kLeafTris; ++k) ids[k] = -1;
    for (int k = 0; k < count; ++k) {
      int32_t t = c->order[first + k];
      const float *a = c->v0 + 3 * t;
      const float *b = c->v1 + 3 * t;
      const float *d = c->v2 + 3 * t;
      row[0 + k] = a[0]; row[12 + k] = a[1]; row[24 + k] = a[2];
      row[36 + k] = b[0] - a[0]; row[48 + k] = b[1] - a[1]; row[60 + k] = b[2] - a[2];
      row[72 + k] = d[0] - a[0]; row[84 + k] = d[1] - a[1]; row[96 + k] = d[2] - a[2];
      ids[k] = t;
    }
    std::memcpy(row + 108, ids, 12 * sizeof(int32_t));
    row[120] = (float)count;
    return (int32_t)(base / 128);
  }

  int32_t emit_node(std::vector<int32_t> children) {  // BNode pool indices
    // expand to 8 slots, splitting the largest-area internal child
    while ((int)children.size() < kWidth) {
      int best = -1;
      float best_a = -1.f;
      for (size_t i = 0; i < children.size(); ++i) {
        const BNode bn = pool->nodes[children[i]];
        if (bn.left >= 0 && bn.bounds.area() > best_a) {
          best_a = bn.bounds.area();
          best = (int)i;
        }
      }
      if (best < 0) break;
      BNode bn = pool->nodes[children[best]];
      children.erase(children.begin() + best);
      children.push_back(bn.left);
      children.push_back(bn.right);
    }
    size_t base = nodes.size();
    nodes.resize(base + 128, 0.f);
    int32_t row_idx = (int32_t)(base / 128);
    int32_t links[kWidth];
    for (int i = 0; i < kWidth; ++i) links[i] = -1;
    for (size_t i = 0; i < children.size() && i < kWidth; ++i) {
      const BNode bn = pool->nodes[children[i]];
      // rows vector may reallocate during recursion: write via index each time
      {
        float *row = &nodes[base];
        row[0 + i] = bn.bounds.lo.x; row[8 + i] = bn.bounds.lo.y;
        row[16 + i] = bn.bounds.lo.z; row[24 + i] = bn.bounds.hi.x;
        row[32 + i] = bn.bounds.hi.y; row[40 + i] = bn.bounds.hi.z;
      }
      int32_t link;
      if (bn.left < 0) {
        link = -2 - emit_leaf(bn.first, bn.count);
      } else {
        link = emit_node({bn.left, bn.right});
      }
      links[i] = link;
    }
    std::memcpy(&nodes[base] + 48, links, kWidth * sizeof(int32_t));
    return row_idx;
  }
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller passes output buffers sized:
//   nodes_out:  max_rows * 128 floats,  leaves_out: max_rows * 128 floats
// with max_rows >= n_tris + 8. Counts written to out_counts[0], out_counts[1].
int build_bvh8(const float *v0, const float *v1, const float *v2,
               int32_t n_tris, float *nodes_out, float *leaves_out,
               int32_t max_rows, int32_t *out_counts, int32_t n_threads) {
  if (n_tris <= 0) return -1;
  BuildCtx c;
  c.v0 = v0; c.v1 = v1; c.v2 = v2;
  c.boxes.resize(n_tris);
  c.centers.resize(n_tris);
  c.order.resize(n_tris);
  AABB root;
  for (int i = 0; i < n_tris; ++i) {
    AABB b;
    b.grow(V3(v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]));
    b.grow(V3(v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]));
    b.grow(V3(v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]));
    c.boxes[i] = b;
    c.centers[i] = b.center();
    c.order[i] = i;
    root.grow(b);
  }
  Pool pool;
  pool.nodes.reserve((size_t)n_tris / 4 + 16);
  int par_depth = 0;
  while ((1 << par_depth) < n_threads) par_depth++;
  int32_t root_idx = build_range(c, pool, 0, n_tris, root, 0, par_depth);

  Emit em;
  em.c = &c;
  em.pool = &pool;
  em.nodes.reserve((size_t)128 * (n_tris / 8 + 8));
  em.leaves.reserve((size_t)128 * (n_tris / 4 + 8));
  const BNode &rn = pool.nodes[root_idx];
  if (rn.left < 0) {
    // tiny scene: one node row pointing at one leaf
    em.nodes.resize(128, 0.f);
    float *row = &em.nodes[0];
    row[0] = rn.bounds.lo.x; row[8] = rn.bounds.lo.y; row[16] = rn.bounds.lo.z;
    row[24] = rn.bounds.hi.x; row[32] = rn.bounds.hi.y; row[40] = rn.bounds.hi.z;
    int32_t links[kWidth];
    for (int i = 0; i < kWidth; ++i) links[i] = -1;
    links[0] = -2 - em.emit_leaf(rn.first, rn.count);
    std::memcpy(row + 48, links, kWidth * sizeof(int32_t));
  } else {
    em.emit_node({rn.left, rn.right});
  }

  int32_t n_node_rows = (int32_t)(em.nodes.size() / 128);
  int32_t n_leaf_rows = (int32_t)(em.leaves.size() / 128);
  if (n_node_rows > max_rows || n_leaf_rows > max_rows) return -2;
  std::memcpy(nodes_out, em.nodes.data(), em.nodes.size() * sizeof(float));
  std::memcpy(leaves_out, em.leaves.data(), em.leaves.size() * sizeof(float));
  out_counts[0] = n_node_rows;
  out_counts[1] = n_leaf_rows;
  // also write tri_order for callers that need sampling CDFs in BVH order
  return 0;
}

}  // extern "C"
