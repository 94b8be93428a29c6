// Native SBVH8 builder: binned-SAH binary build with SPATIAL SPLITS
// (Stich et al. 2009, like the reference's SplitBVHBuilder —
// /root/reference/Engine/SpatialStructures/BVH/SplitBVHBuilder.hpp:59) and an
// 8-wide collapse into the fat-row layout consumed by ops/traversal8.py.
//
// Differences from the reference implementation (this is a redesign, not a
// port): reference lists are per-subtree std::vectors moved down the
// recursion (no shared sort buffers), object splits are binned over all three
// axes, spatial splits use chopped binning with triangle clipping, and the
// output is the TPU fat-row table instead of 2-wide Woop nodes.
// Exposed via a C ABI for ctypes; multithreaded at the top of the tree via
// std::async.
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

constexpr int kBins = 16;         // object-split bins (per axis)
constexpr int kSpatialBins = 32;  // spatial-split bins (per axis)
constexpr int kLeafTris = 12;
constexpr int kWidth = 8;
// spatial splits considered when child overlap > kAlpha * root area
// (reference SplitBVHBuilder uses 1e-5)
constexpr float kAlpha = 1e-5f;
// reference-duplication budget: refs may grow to this factor of tri count
constexpr float kRefBudget = 1.4f;

struct V3 {
  float x, y, z;
  V3() : x(0), y(0), z(0) {}
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
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
  void clip(const AABB &o) { lo = vmax(lo, o.lo); hi = vmin(hi, o.hi); }
  bool valid() const { return lo.x <= hi.x && lo.y <= hi.y && lo.z <= hi.z; }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f), dy = std::max(hi.y - lo.y, 0.f),
          dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
  V3 center() const {
    return V3(0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y), 0.5f * (lo.z + hi.z));
  }
};

struct Ref {
  int32_t tri;
  AABB box;
};

struct Ctx {
  const float *v0, *v1, *v2;
  float root_area = 0.f;
  std::atomic<long long> refs_left{0};  // remaining duplication budget
  V3 tri_vert(int32_t t, int k) const {
    const float *p = (k == 0 ? v0 : (k == 1 ? v1 : v2)) + 3 * t;
    return V3(p[0], p[1], p[2]);
  }
};

// binary-tree node produced by the SAH build; leaves own their refs
struct BNode {
  AABB bounds;
  int32_t left = -1, right = -1;
  std::vector<Ref> leaf_refs;
};

struct Pool {
  std::vector<BNode> nodes;
  std::mutex mtx;
  int32_t put(BNode &&n) {
    std::lock_guard<std::mutex> g(mtx);
    int32_t i = (int32_t)nodes.size();
    nodes.push_back(std::move(n));
    return i;
  }
};

// clip the (possibly already clipped) triangle ref to the half-space
// axis <= pos (keep_left) or axis >= pos, returning the clipped AABB.
// Sutherland-Hodgman on the original triangle, then intersect with ref.box.
static AABB clip_tri(const Ctx &c, const Ref &r, int axis, float pos,
                     bool keep_left) {
  V3 poly[8];
  int n = 3;
  poly[0] = c.tri_vert(r.tri, 0);
  poly[1] = c.tri_vert(r.tri, 1);
  poly[2] = c.tri_vert(r.tri, 2);
  V3 out[8];
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const V3 &a = poly[i];
    const V3 &b = poly[(i + 1) % n];
    float da = keep_left ? (pos - a[axis]) : (a[axis] - pos);
    float db = keep_left ? (pos - b[axis]) : (b[axis] - pos);
    if (da >= 0) out[m++] = a;
    if ((da >= 0) != (db >= 0)) {
      float t = da / (da - db);
      out[m++] = V3(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
                    a.z + t * (b.z - a.z));
    }
  }
  AABB bb;
  for (int i = 0; i < m; ++i) bb.grow(out[i]);
  bb.clip(r.box);
  if (!bb.valid()) {  // degenerate: clamp the ref box to the half-space
    bb = r.box;
    if (keep_left) {
      if (axis == 0) bb.hi.x = std::min(bb.hi.x, pos);
      else if (axis == 1) bb.hi.y = std::min(bb.hi.y, pos);
      else bb.hi.z = std::min(bb.hi.z, pos);
    } else {
      if (axis == 0) bb.lo.x = std::max(bb.lo.x, pos);
      else if (axis == 1) bb.lo.y = std::max(bb.lo.y, pos);
      else bb.lo.z = std::max(bb.lo.z, pos);
    }
  }
  return bb;
}

struct ObjectSplit {
  float cost = 1e30f;
  int axis = -1, bin = -1;
  float lo = 0.f, scale = 0.f;
  AABB lb, rb;
};

struct SpatialSplit {
  float cost = 1e30f;
  int axis = -1;
  float pos = 0.f;
};

static ObjectSplit find_object_split(const std::vector<Ref> &refs) {
  ObjectSplit best;
  AABB cb;
  for (const Ref &r : refs) cb.grow(r.box.center());
  for (int axis = 0; axis < 3; ++axis) {
    float lo = cb.lo[axis], ext = cb.hi[axis] - cb.lo[axis];
    if (ext < 1e-12f) continue;
    float scale = kBins * (1.f - 1e-6f) / ext;
    AABB bb[kBins];
    int cnt[kBins] = {0};
    for (const Ref &r : refs) {
      int b = (int)((r.box.center()[axis] - lo) * scale);
      b = std::min(std::max(b, 0), kBins - 1);
      bb[b].grow(r.box);
      cnt[b]++;
    }
    AABB rgt[kBins];
    int rc[kBins];
    AABB acc;
    int ac = 0;
    for (int b = kBins - 1; b >= 0; --b) {
      acc.grow(bb[b]);
      ac += cnt[b];
      rgt[b] = acc;
      rc[b] = ac;
    }
    acc = AABB();
    ac = 0;
    for (int b = 0; b < kBins - 1; ++b) {
      acc.grow(bb[b]);
      ac += cnt[b];
      if (ac == 0 || rc[b + 1] == 0) continue;
      float cost = acc.area() * ac + rgt[b + 1].area() * rc[b + 1];
      if (cost < best.cost) {
        best.cost = cost;
        best.axis = axis;
        best.bin = b;
        best.lo = lo;
        best.scale = scale;
        best.lb = acc;
        best.rb = rgt[b + 1];
      }
    }
  }
  return best;
}

static SpatialSplit find_spatial_split(const Ctx &c,
                                       const std::vector<Ref> &refs,
                                       const AABB &bounds) {
  SpatialSplit best;
  for (int axis = 0; axis < 3; ++axis) {
    float lo = bounds.lo[axis], ext = bounds.hi[axis] - bounds.lo[axis];
    if (ext < 1e-12f) continue;
    float scale = kSpatialBins * (1.f - 1e-6f) / ext;
    float inv_scale = ext / kSpatialBins;
    AABB bb[kSpatialBins];
    int entry[kSpatialBins] = {0}, exit_[kSpatialBins] = {0};
    for (const Ref &r : refs) {
      int b0 = (int)((r.box.lo[axis] - lo) * scale);
      int b1 = (int)((r.box.hi[axis] - lo) * scale);
      b0 = std::min(std::max(b0, 0), kSpatialBins - 1);
      b1 = std::min(std::max(b1, 0), kSpatialBins - 1);
      if (b0 == b1) {
        bb[b0].grow(r.box);
      } else {
        // chopped binning: clip the tri into each spanned bin
        Ref cur = r;
        for (int b = b0; b < b1; ++b) {
          float pos = lo + (b + 1) * inv_scale;
          AABB lpart = clip_tri(c, cur, axis, pos, true);
          bb[b].grow(lpart);
          cur.box = clip_tri(c, cur, axis, pos, false);
        }
        bb[b1].grow(cur.box);
      }
      entry[b0]++;
      exit_[b1]++;
    }
    AABB rgt[kSpatialBins];
    AABB acc;
    for (int b = kSpatialBins - 1; b >= 0; --b) {
      acc.grow(bb[b]);
      rgt[b] = acc;
    }
    acc = AABB();
    int nl = 0, nr = (int)refs.size();
    for (int b = 0; b < kSpatialBins - 1; ++b) {
      acc.grow(bb[b]);
      nl += entry[b];
      nr -= exit_[b];
      if (nl == 0 || nr == 0) continue;
      float cost = acc.area() * nl + rgt[b + 1].area() * nr;
      if (cost < best.cost) {
        best.cost = cost;
        best.axis = axis;
        best.pos = lo + (b + 1) * inv_scale;
      }
    }
  }
  return best;
}

static int32_t build_node(Ctx &c, Pool &pool, std::vector<Ref> refs,
                          const AABB &bounds, int depth, int par_depth);

static void split_refs(Ctx &c, std::vector<Ref> refs, const AABB &bounds,
                       const ObjectSplit &os, const SpatialSplit &ss,
                       std::vector<Ref> &lrefs, std::vector<Ref> &rrefs,
                       AABB &lb, AABB &rb) {
  bool use_spatial = ss.cost < os.cost && c.refs_left.load() > 0;
  if (use_spatial) {
    for (const Ref &r : refs) {
      if (r.box.hi[ss.axis] <= ss.pos) {
        lrefs.push_back(r);
        lb.grow(r.box);
      } else if (r.box.lo[ss.axis] >= ss.pos) {
        rrefs.push_back(r);
        rb.grow(r.box);
      } else {
        // straddler: reference unsplitting (cheap test) — put whole ref on
        // one side when that is cheaper than duplicating it
        AABB lpart = clip_tri(c, r, ss.axis, ss.pos, true);
        AABB rpart = clip_tri(c, r, ss.axis, ss.pos, false);
        AABB lb_whole = lb;
        lb_whole.grow(r.box);
        AABB rb_whole = rb;
        rb_whole.grow(r.box);
        AABB lb_dup = lb, rb_dup = rb;
        lb_dup.grow(lpart);
        rb_dup.grow(rpart);
        float c_dup = lb_dup.area() + rb_dup.area();
        float c_left = lb_whole.area() + rb.area();
        float c_right = lb.area() + rb_whole.area();
        bool can_dup = c.refs_left.fetch_sub(0) > 0;
        if (can_dup && c_dup <= c_left && c_dup <= c_right) {
          c.refs_left.fetch_sub(1);
          lrefs.push_back({r.tri, lpart});
          rrefs.push_back({r.tri, rpart});
          lb = lb_dup;
          rb = rb_dup;
        } else if (c_left <= c_right) {
          lrefs.push_back(r);
          lb = lb_whole;
        } else {
          rrefs.push_back(r);
          rb = rb_whole;
        }
      }
    }
    if (lrefs.empty() || rrefs.empty()) {
      // pathological: fall back to median partition
      lrefs.clear();
      rrefs.clear();
      lb = AABB();
      rb = AABB();
      size_t half = refs.size() / 2;
      for (size_t i = 0; i < refs.size(); ++i) {
        if (i < half) {
          lrefs.push_back(refs[i]);
          lb.grow(refs[i].box);
        } else {
          rrefs.push_back(refs[i]);
          rb.grow(refs[i].box);
        }
      }
    }
    return;
  }
  if (os.axis < 0) {  // degenerate centroid bounds: median split
    size_t half = refs.size() / 2;
    for (size_t i = 0; i < refs.size(); ++i) {
      if (i < half) {
        lrefs.push_back(refs[i]);
        lb.grow(refs[i].box);
      } else {
        rrefs.push_back(refs[i]);
        rb.grow(refs[i].box);
      }
    }
    return;
  }
  for (const Ref &r : refs) {
    int b = (int)((r.box.center()[os.axis] - os.lo) * os.scale);
    b = std::min(std::max(b, 0), kBins - 1);
    if (b <= os.bin) {
      lrefs.push_back(r);
      lb.grow(r.box);
    } else {
      rrefs.push_back(r);
      rb.grow(r.box);
    }
  }
  if (lrefs.empty() || rrefs.empty()) {
    std::vector<Ref> all;
    all.reserve(lrefs.size() + rrefs.size());
    for (auto &r : lrefs) all.push_back(r);
    for (auto &r : rrefs) all.push_back(r);
    lrefs.clear();
    rrefs.clear();
    lb = AABB();
    rb = AABB();
    size_t half = all.size() / 2;
    for (size_t i = 0; i < all.size(); ++i) {
      if (i < half) {
        lrefs.push_back(all[i]);
        lb.grow(all[i].box);
      } else {
        rrefs.push_back(all[i]);
        rb.grow(all[i].box);
      }
    }
  }
}

static int32_t build_node(Ctx &c, Pool &pool, std::vector<Ref> refs,
                          const AABB &bounds, int depth, int par_depth) {
  BNode node;
  node.bounds = bounds;
  if ((int)refs.size() <= kLeafTris) {
    node.leaf_refs = std::move(refs);
    return pool.put(std::move(node));
  }
  ObjectSplit os = find_object_split(refs);
  SpatialSplit ss;
  if (os.axis >= 0) {
    AABB overlap = os.lb;
    overlap.clip(os.rb);
    if (overlap.valid() && overlap.area() > kAlpha * c.root_area)
      ss = find_spatial_split(c, refs, bounds);
  } else {
    ss = find_spatial_split(c, refs, bounds);
  }
  std::vector<Ref> lrefs, rrefs;
  lrefs.reserve(refs.size() / 2 + 8);
  rrefs.reserve(refs.size() / 2 + 8);
  AABB lb, rb;
  split_refs(c, std::move(refs), bounds, os, ss, lrefs, rrefs, lb, rb);
  if (depth < par_depth) {
    auto rfut = std::async(std::launch::async, [&c, &pool, &rrefs, rb, depth,
                                                par_depth]() {
      return build_node(c, pool, std::move(rrefs), rb, depth + 1, par_depth);
    });
    node.left = build_node(c, pool, std::move(lrefs), lb, depth + 1, par_depth);
    node.right = rfut.get();
  } else {
    node.left = build_node(c, pool, std::move(lrefs), lb, depth + 1, par_depth);
    node.right = build_node(c, pool, std::move(rrefs), rb, depth + 1, par_depth);
  }
  return pool.put(std::move(node));
}

// ---------------- collapse to 8-wide fat rows ----------------

struct Emit {
  std::vector<float> nodes;   // rows of 128
  std::vector<float> leaves;  // rows of 128
  Ctx *c;
  Pool *pool;

  int32_t emit_leaf(const std::vector<Ref> &refs) {
    size_t base = leaves.size();
    leaves.resize(base + 128, 0.f);
    float *row = &leaves[base];
    int32_t ids[kLeafTris];
    for (int k = 0; k < kLeafTris; ++k) ids[k] = -1;
    int count = std::min((int)refs.size(), kLeafTris);
    for (int k = 0; k < count; ++k) {
      int32_t t = refs[k].tri;
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
        const BNode &bn = pool->nodes[children[i]];
        if (bn.left >= 0 && bn.bounds.area() > best_a) {
          best_a = bn.bounds.area();
          best = (int)i;
        }
      }
      if (best < 0) break;
      int32_t l = pool->nodes[children[best]].left;
      int32_t r = pool->nodes[children[best]].right;
      children.erase(children.begin() + best);
      children.push_back(l);
      children.push_back(r);
    }
    size_t base = nodes.size();
    nodes.resize(base + 128, 0.f);
    int32_t row_idx = (int32_t)(base / 128);
    int32_t links[kWidth];
    for (int i = 0; i < kWidth; ++i) links[i] = -1;
    for (size_t i = 0; i < children.size() && i < (size_t)kWidth; ++i) {
      // copy bounds before recursing (rows vector may reallocate)
      AABB cb = pool->nodes[children[i]].bounds;
      {
        float *row = &nodes[base];
        row[0 + i] = cb.lo.x; row[8 + i] = cb.lo.y; row[16 + i] = cb.lo.z;
        row[24 + i] = cb.hi.x; row[32 + i] = cb.hi.y; row[40 + i] = cb.hi.z;
      }
      const BNode &bn = pool->nodes[children[i]];
      int32_t link;
      if (bn.left < 0) {
        link = -2 - emit_leaf(bn.leaf_refs);
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
// with max_rows >= 1.5 * n_tris + 8. Counts written to out_counts[0] (node
// rows) and out_counts[1] (leaf rows).
int build_bvh8(const float *v0, const float *v1, const float *v2,
               int32_t n_tris, float *nodes_out, float *leaves_out,
               int32_t max_rows, int32_t *out_counts, int32_t n_threads) {
  if (n_tris <= 0) return -1;
  Ctx c;
  c.v0 = v0; c.v1 = v1; c.v2 = v2;
  std::vector<Ref> refs(n_tris);
  AABB root;
  for (int i = 0; i < n_tris; ++i) {
    AABB b;
    b.grow(V3(v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]));
    b.grow(V3(v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]));
    b.grow(V3(v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]));
    refs[i] = {i, b};
    root.grow(b);
  }
  c.root_area = root.area();
  c.refs_left = (long long)(n_tris * (kRefBudget - 1.f));
  Pool pool;
  pool.nodes.reserve((size_t)n_tris / 4 + 16);
  int par_depth = 0;
  while ((1 << par_depth) < n_threads) par_depth++;
  int32_t root_idx =
      build_node(c, pool, std::move(refs), root, 0, par_depth);

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
    links[0] = -2 - em.emit_leaf(rn.leaf_refs);
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
  return 0;
}

}  // extern "C"
