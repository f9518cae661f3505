// strolle_native — host-side C++ runtime for strolle_tpu.
//
// TPU-native rebuild of the reference engine's host-Rust performance
// pieces (the parts that are NOT device compute and therefore stay on
// the host CPU):
//
//   * binned-SAH BVH builder  (re-derivation of strolle/src/bvh/
//     builder.rs: 12 bins, split rejected when SAH cost >= leaf cost)
//     emitting the same flat typed-array layout the JAX/Pallas
//     traversal kernels consume (strolle_tpu/bvh/builder.py contract)
//   * bottom-up BVH refit for deforming geometry with unchanged
//     topology (the "refit-only fast path" of SURVEY.md §7.8.4)
//   * incremental rebuild with subtree-hash ghost reuse
//     (strolle/src/bvh/builder.rs:204-279 semantics)
//   * range allocator           (strolle/src/utils/allocator.rs)
//   * guillotine atlas allocator(strolle/src/images.rs / guillotiere)
//   * world-space triangle transform with inverse-transpose normals
//     (strolle/src/mesh_triangle.rs:48-87 semantics)
//
// Exposed as a plain C ABI consumed via ctypes
// (strolle_tpu/native/__init__.py). No Python.h dependency.

#include <algorithm>
#include <cfloat>
#include <climits>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <utility>
#include <vector>

#define API extern "C" __attribute__((visibility("default")))

namespace {

constexpr int SAH_BINS = 12;
constexpr int MAX_LEAF_SIZE = 8;

struct V3 {
  float x, y, z;
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

static inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
  V3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  V3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const V3 &a, const V3 &b) {
    lo = vmin(lo, a);
    hi = vmax(hi, b);
  }
  void grow(const Aabb &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  // half surface area — the SAH area term (utils/bounding_box.rs
  // half_area semantics)
  float half_area() const {
    float ex = std::max(hi.x - lo.x, 0.0f);
    float ey = std::max(hi.y - lo.y, 0.0f);
    float ez = std::max(hi.z - lo.z, 0.0f);
    return ex * ey + ey * ez + ez * ex;
  }
};

// splitmix64 finalizer: the per-primitive key mixes the bit patterns of
// its AABB (the only geometry the BVH depends on)
static inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

// Previous-build snapshot for incremental subtree reuse
// (builder.rs:204-279 ghost-reuse semantics, re-derived for the
// reordered-triangle layout: subtrees are matched by an
// order-independent hash of their primitives' AABB keys, and on a hit
// the node structure is copied with leaf offsets rebased while current
// primitives are matched to previous leaf slots by key).
struct BvhCtx {
  std::vector<float> cmin, cmax;      // [n,2,3]
  std::vector<int32_t> child, count;  // [n,2]
  std::vector<uint64_t> keys;         // [T] key per ORDER position
  int n_nodes = 0;
  int n_tris = 0;
  struct Sub {
    int32_t node;   // subtree root node id (internal nodes only)
    int first;      // leaf-sequential primitive range
    int count;
    int depth;      // subtree depth
    int n_sub;      // nodes in the subtree
  };
  std::unordered_map<uint64_t, Sub> subs;
};

constexpr int MIN_REUSE_PRIMS = 16;

struct Builder {
  const float *tmin;  // [T,3]
  const float *tmax;
  const float *center;  // [T,3]
  int32_t *ids;         // permutation being built, [T]
  const uint64_t *key = nullptr;  // [T] per-primitive AABB keys (optional)
  const BvhCtx *prev = nullptr;   // previous build (optional)

  // output node arrays (row-per-node, 2 children each)
  float *out_cmin;      // [maxN,2,3]
  float *out_cmax;      // [maxN,2,3]
  int32_t *out_child;   // [maxN,2]
  int32_t *out_count;   // [maxN,2]
  int max_nodes;
  int n_nodes = 0;
  int max_depth = 0;
  int reused_nodes = 0;
  bool overflow = false;

  V3 tri_min(int32_t id) const {
    return {tmin[3 * id], tmin[3 * id + 1], tmin[3 * id + 2]};
  }
  V3 tri_max(int32_t id) const {
    return {tmax[3 * id], tmax[3 * id + 1], tmax[3 * id + 2]};
  }

  Aabb range_bounds(int first, int count) const {
    Aabb b;
    for (int i = first; i < first + count; ++i)
      b.grow(tri_min(ids[i]), tri_max(ids[i]));
    return b;
  }

  // Best binned-SAH split of ids[first..first+count). Returns axis or
  // -1 when the centers are degenerate on every axis.
  int find_split(int first, int count, float *out_thresh, float *out_cost) {
    int best_axis = -1;
    float best_cost = FLT_MAX, best_thresh = 0.0f;
    for (int axis = 0; axis < 3; ++axis) {
      float lo = FLT_MAX, hi = -FLT_MAX;
      for (int i = first; i < first + count; ++i) {
        float c = center[3 * ids[i] + axis];
        lo = std::min(lo, c);
        hi = std::max(hi, c);
      }
      if (hi - lo <= 1e-12f) continue;
      float scale = SAH_BINS * (1.0f - 1e-6f) / (hi - lo);
      int bin_count[SAH_BINS] = {0};
      Aabb bin_box[SAH_BINS];
      for (int i = first; i < first + count; ++i) {
        int32_t id = ids[i];
        int b = std::min((int)((center[3 * id + axis] - lo) * scale),
                         SAH_BINS - 1);
        bin_count[b]++;
        bin_box[b].grow(tri_min(id), tri_max(id));
      }
      // prefix/suffix area+count sweeps
      float larea[SAH_BINS], rarea[SAH_BINS];
      int lcount[SAH_BINS], rcount[SAH_BINS];
      {
        Aabb acc;
        int n = 0;
        for (int b = 0; b < SAH_BINS; ++b) {
          acc.grow(bin_box[b]);
          n += bin_count[b];
          larea[b] = acc.half_area();
          lcount[b] = n;
        }
      }
      {
        Aabb acc;
        int n = 0;
        for (int b = SAH_BINS - 1; b >= 0; --b) {
          acc.grow(bin_box[b]);
          n += bin_count[b];
          rarea[b] = acc.half_area();
          rcount[b] = n;
        }
      }
      for (int cut = 0; cut < SAH_BINS - 1; ++cut) {
        int nl = lcount[cut], nr = rcount[cut + 1];
        if (nl == 0 || nr == 0) continue;
        float cost = nl * larea[cut] + nr * rarea[cut + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_thresh = lo + (cut + 1) * (hi - lo) / SAH_BINS;
        }
      }
    }
    *out_thresh = best_thresh;
    *out_cost = best_cost;
    return best_axis;
  }

  // Partitions ids[first..first+count) by center<=thresh on axis;
  // falls back to a median split when one side would be empty.
  int partition(int first, int count, int axis, float thresh) {
    int32_t *lo = ids + first, *hi = ids + first + count;
    int32_t *mid = std::partition(lo, hi, [&](int32_t id) {
      return center[3 * id + axis] <= thresh;
    });
    int nl = (int)(mid - lo);
    if (nl == 0 || nl == count) {
      nl = count / 2;
      std::nth_element(lo, lo + nl, hi, [&](int32_t a, int32_t b) {
        return center[3 * a + axis] < center[3 * b + axis];
      });
    }
    return nl;
  }

  int median_axis(int first, int count) const {
    float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = first; i < first + count; ++i)
      for (int a = 0; a < 3; ++a) {
        float c = center[3 * ids[i] + a];
        lo[a] = std::min(lo[a], c);
        hi[a] = std::max(hi[a], c);
      }
    int axis = 0;
    float best = -1.0f;
    for (int a = 0; a < 3; ++a)
      if (hi[a] - lo[a] > best) {
        best = hi[a] - lo[a];
        axis = a;
      }
    return axis;
  }

  struct Item {
    int first, count;
    int node, slot;  // write child descriptor here; node<0 => root range
    int depth;
  };

  void write_leaf(const Item &it) {
    Aabb b = range_bounds(it.first, it.count);
    write_child(it.node, it.slot, b, -(it.first + 1), it.count);
    max_depth = std::max(max_depth, it.depth);
  }

  // Attempts to satisfy a work item by copying a hash-matched subtree
  // of the previous build. Returns true when the item was emitted.
  bool try_reuse(const Item &it) {
    if (!prev || !key || it.count < MIN_REUSE_PRIMS) return false;
    uint64_t h = 0;
    for (int i = it.first; i < it.first + it.count; ++i) h += key[ids[i]];
    auto f = prev->subs.find(h);
    if (f == prev->subs.end()) return false;
    const BvhCtx::Sub &sub = f->second;
    if (sub.count != it.count) return false;
    if (n_nodes + sub.n_sub > max_nodes) return false;

    // match current primitives to previous leaf slots by key; any rank
    // mismatch means a hash collision -> bail out to a fresh split
    std::vector<std::pair<uint64_t, int32_t>> cur(it.count);
    std::vector<std::pair<uint64_t, int32_t>> old(it.count);
    for (int j = 0; j < it.count; ++j) {
      cur[j] = {key[ids[it.first + j]], ids[it.first + j]};
      old[j] = {prev->keys[sub.first + j], (int32_t)j};  // slot offset
    }
    std::sort(cur.begin(), cur.end());
    std::sort(old.begin(), old.end());
    for (int j = 0; j < it.count; ++j)
      if (cur[j].first != old[j].first) return false;
    for (int j = 0; j < it.count; ++j)
      ids[it.first + old[j].second] = cur[j].second;

    // copy the subtree (pre-order keeps child id > parent id, the
    // refit invariant); leaf tokens are rebased to the current range
    struct CopyItem { int32_t pid; int node, slot; int depth; };
    std::vector<CopyItem> stack;
    Aabb root_b;
    {
      const float *cm = prev->cmin.data() + (size_t)sub.node * 6;
      const float *cx = prev->cmax.data() + (size_t)sub.node * 6;
      for (int k = 0; k < 2; ++k) {
        root_b.grow({cm[k * 3], cm[k * 3 + 1], cm[k * 3 + 2]},
                    {cx[k * 3], cx[k * 3 + 1], cx[k * 3 + 2]});
      }
    }
    int root_new = n_nodes++;
    write_child(it.node, it.slot, root_b, root_new, 0);
    stack.push_back({sub.node, root_new, -1, it.depth});
    while (!stack.empty()) {
      CopyItem ci = stack.back();
      stack.pop_back();
      int nid = ci.node;
      max_depth = std::max(max_depth, ci.depth + 1);
      for (int k = 0; k < 2; ++k) {
        const float *cm = prev->cmin.data() + (size_t)ci.pid * 6 + k * 3;
        const float *cx = prev->cmax.data() + (size_t)ci.pid * 6 + k * 3;
        Aabb b;
        b.lo = {cm[0], cm[1], cm[2]};
        b.hi = {cx[0], cx[1], cx[2]};
        int32_t t = prev->child[2 * ci.pid + k];
        int32_t c = prev->count[2 * ci.pid + k];
        if (t < 0) {
          int pf = -(t + 1);
          write_child(nid, k, b, -(it.first + (pf - sub.first) + 1), c);
        } else {
          int cn = n_nodes++;
          write_child(nid, k, b, cn, 0);
          stack.push_back({t, cn, k, ci.depth + 1});
        }
      }
    }
    reused_nodes += sub.n_sub;
    return true;
  }

  void write_child(int node, int slot, const Aabb &b, int32_t token,
                   int32_t count) {
    float *cm = out_cmin + (size_t)node * 6 + slot * 3;
    float *cx = out_cmax + (size_t)node * 6 + slot * 3;
    cm[0] = b.lo.x; cm[1] = b.lo.y; cm[2] = b.lo.z;
    cx[0] = b.hi.x; cx[1] = b.hi.y; cx[2] = b.hi.z;
    out_child[2 * node + slot] = token;
    out_count[2 * node + slot] = count;
  }

  void run(int n_tris) {
    std::vector<Item> work;
    work.reserve(64);

    // root node is always node 0
    n_nodes = 1;
    Aabb root_b = range_bounds(0, n_tris);
    float thresh, cost;
    int axis = n_tris > 1 ? find_split(0, n_tris, &thresh, &cost) : -1;
    bool leaf = axis < 0 ||
                (n_tris <= MAX_LEAF_SIZE &&
                 cost >= n_tris * root_b.half_area());
    if (leaf && n_tris > MAX_LEAF_SIZE) {
      axis = median_axis(0, n_tris);
      thresh = NAN;  // force median partition
      leaf = false;
    }
    if (leaf) {
      // whole scene in one leaf: child0 = everything, child1 empty
      write_child(0, 0, root_b, -1, n_tris);
      Aabb empty;
      write_child(0, 1, empty, -1, 0);
      max_depth = 1;
      return;
    }
    int nl = std::isnan(thresh) ? force_median(0, n_tris, axis)
                                : partition(0, n_tris, axis, thresh);
    work.push_back({0, nl, 0, 0, 1});
    work.push_back({nl, n_tris - nl, 0, 1, 1});

    while (!work.empty()) {
      Item it = work.back();
      work.pop_back();
      if (try_reuse(it)) continue;
      int n = it.count;
      Aabb b = range_bounds(it.first, n);

      int ax = n > 1 ? find_split(it.first, n, &thresh, &cost) : -1;
      bool make_leaf =
          ax < 0 || (cost >= n * b.half_area() && n <= MAX_LEAF_SIZE);
      if (make_leaf && n > MAX_LEAF_SIZE) {
        ax = median_axis(it.first, n);
        thresh = NAN;
        make_leaf = false;
      }
      if (make_leaf) {
        write_leaf(it);
        continue;
      }
      if (n_nodes >= max_nodes) {
        overflow = true;
        write_leaf(it);  // degrade gracefully (oversized leaf)
        continue;
      }
      int nid = n_nodes++;
      write_child(it.node, it.slot, b, nid, 0);
      int cl = std::isnan(thresh) ? force_median(it.first, n, ax)
                                  : partition(it.first, n, ax, thresh);
      work.push_back({it.first, cl, nid, 0, it.depth + 1});
      work.push_back({it.first + cl, n - cl, nid, 1, it.depth + 1});
    }
  }

  int force_median(int first, int count, int axis) {
    int nl = count / 2;
    std::nth_element(ids + first, ids + first + nl, ids + first + count,
                     [&](int32_t a, int32_t b) {
                       return center[3 * a + axis] < center[3 * b + axis];
                     });
    return nl;
  }
};

}  // namespace

// Builds a BVH over `positions` [T,3,3] (row-major f32).
// Outputs (caller-allocated): cmin/cmax [max_nodes,2,3], child/count
// [max_nodes,2], order [T] (the permutation: leaf ranges index the
// reordered triangle array).  Returns the node count, or -1 when
// max_nodes was too small (the tree is still valid but has oversized
// leaves; callers should retry with a bigger budget).
API int strolle_bvh_build(const float *positions, int n_tris,
                          float *out_cmin, float *out_cmax,
                          int32_t *out_child, int32_t *out_count,
                          int32_t *out_order, int max_nodes,
                          int *out_max_depth) {
  if (n_tris <= 0 || max_nodes < 1) return -1;
  std::vector<float> tmin((size_t)n_tris * 3), tmax((size_t)n_tris * 3),
      center((size_t)n_tris * 3);
  for (int i = 0; i < n_tris; ++i) {
    const float *p = positions + (size_t)i * 9;
    for (int a = 0; a < 3; ++a) {
      float lo = std::min(p[a], std::min(p[3 + a], p[6 + a]));
      float hi = std::max(p[a], std::max(p[3 + a], p[6 + a]));
      tmin[3 * i + a] = lo;
      tmax[3 * i + a] = hi;
      center[3 * i + a] = 0.5f * (lo + hi);
    }
  }
  for (int i = 0; i < n_tris; ++i) out_order[i] = i;

  Builder b;
  b.tmin = tmin.data();
  b.tmax = tmax.data();
  b.center = center.data();
  b.ids = out_order;
  b.out_cmin = out_cmin;
  b.out_cmax = out_cmax;
  b.out_child = out_child;
  b.out_count = out_count;
  b.max_nodes = max_nodes;
  b.run(n_tris);
  *out_max_depth = b.max_depth + 2;  // slack for the traversal stack
  return b.overflow ? -1 : b.n_nodes;
}

// Bottom-up AABB refit: recomputes child boxes for an existing
// topology over moved vertices (positions are the REORDERED [T,3,3]
// array the leaf ranges index). Children always have larger node ids
// than their parent (builder invariant), so one reverse sweep works.
API int strolle_bvh_refit(const float *positions, int n_tris,
                          float *cmin, float *cmax, const int32_t *child,
                          const int32_t *count, int n_nodes) {
  (void)n_tris;
  std::vector<Aabb> node_box((size_t)n_nodes);
  for (int n = n_nodes - 1; n >= 0; --n) {
    Aabb total;
    for (int k = 0; k < 2; ++k) {
      int32_t c = child[2 * n + k];
      Aabb b;
      if (c < 0) {  // leaf range
        int first = -(c + 1);
        for (int i = first; i < first + count[2 * n + k]; ++i) {
          const float *p = positions + (size_t)i * 9;
          for (int v = 0; v < 3; ++v) {
            V3 q{p[3 * v], p[3 * v + 1], p[3 * v + 2]};
            b.grow(q, q);
          }
        }
      } else if (c < n_nodes) {
        b = node_box[c];
      }
      float *cm = cmin + (size_t)n * 6 + k * 3;
      float *cx = cmax + (size_t)n * 6 + k * 3;
      cm[0] = b.lo.x; cm[1] = b.lo.y; cm[2] = b.lo.z;
      cx[0] = b.hi.x; cx[1] = b.hi.y; cx[2] = b.hi.z;
      total.grow(b);
    }
    node_box[n] = total;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Incremental BVH build context (subtree-hash ghost reuse,
// builder.rs:204-279 counterpart for the reordered-triangle layout).

namespace {

uint64_t prim_key(const float *tmin, const float *tmax, int32_t id) {
  uint64_t h = 0x2545f4914f6cdd1dull;
  for (int a = 0; a < 3; ++a) {
    uint32_t lo, hi;
    std::memcpy(&lo, tmin + 3 * id + a, 4);
    std::memcpy(&hi, tmax + 3 * id + a, 4);
    h = mix64(h ^ lo);
    h = mix64(h ^ hi);
  }
  return h;
}

// Snapshots a finished build into `ctx` and indexes every internal
// child subtree by the order-independent hash of its primitive keys.
void snapshot_ctx(BvhCtx *ctx, const float *cmin, const float *cmax,
                  const int32_t *child, const int32_t *count, int n_nodes,
                  const int32_t *order, const uint64_t *key_by_id,
                  int n_tris) {
  ctx->cmin.assign(cmin, cmin + (size_t)n_nodes * 6);
  ctx->cmax.assign(cmax, cmax + (size_t)n_nodes * 6);
  ctx->child.assign(child, child + (size_t)n_nodes * 2);
  ctx->count.assign(count, count + (size_t)n_nodes * 2);
  ctx->n_nodes = n_nodes;
  ctx->n_tris = n_tris;
  ctx->keys.resize(n_tris);
  for (int i = 0; i < n_tris; ++i) ctx->keys[i] = key_by_id[order[i]];

  // prefix sums of position keys give O(1) range hashes
  std::vector<uint64_t> prefix((size_t)n_tris + 1, 0);
  for (int i = 0; i < n_tris; ++i) prefix[i + 1] = prefix[i] + ctx->keys[i];

  // bottom-up: children have larger ids than their parent
  std::vector<int> first((size_t)n_nodes, INT32_MAX);
  std::vector<int> last((size_t)n_nodes, 0);
  std::vector<int> nsub((size_t)n_nodes, 1);
  std::vector<int> depth((size_t)n_nodes, 1);
  ctx->subs.clear();
  for (int n = n_nodes - 1; n >= 0; --n) {
    for (int k = 0; k < 2; ++k) {
      int32_t t = child[2 * n + k];
      if (t < 0) {
        int f = -(t + 1);
        int c = count[2 * n + k];
        if (c > 0) {
          first[n] = std::min(first[n], f);
          last[n] = std::max(last[n], f + c);
        }
      } else if (t < n_nodes) {
        first[n] = std::min(first[n], first[t]);
        last[n] = std::max(last[n], last[t]);
        nsub[n] += nsub[t];
        depth[n] = std::max(depth[n], depth[t] + 1);
        int c = last[t] - first[t];
        if (c >= MIN_REUSE_PRIMS) {
          uint64_t h = prefix[last[t]] - prefix[first[t]];
          ctx->subs.emplace(
              h, BvhCtx::Sub{t, first[t], c, depth[t], nsub[t]});
        }
      }
    }
    if (first[n] == INT32_MAX) first[n] = 0;  // degenerate/empty
  }
}

}  // namespace

API void *strolle_bvh_ctx_new(void) { return new BvhCtx(); }
API void strolle_bvh_ctx_free(void *h) { delete (BvhCtx *)h; }

// strolle_bvh_build plus cross-frame subtree reuse through `ctx`
// (builder.rs:204-279 ghost semantics). `out_reused_nodes` reports how
// many node rows were copied instead of re-split.
API int strolle_bvh_build_incremental(
    void *ctx_h, const float *positions, int n_tris, float *out_cmin,
    float *out_cmax, int32_t *out_child, int32_t *out_count,
    int32_t *out_order, int max_nodes, int *out_max_depth,
    int *out_reused_nodes) {
  if (n_tris <= 0 || max_nodes < 1) return -1;
  BvhCtx *ctx = (BvhCtx *)ctx_h;
  std::vector<float> tmin((size_t)n_tris * 3), tmax((size_t)n_tris * 3),
      center((size_t)n_tris * 3);
  for (int i = 0; i < n_tris; ++i) {
    const float *p = positions + (size_t)i * 9;
    for (int a = 0; a < 3; ++a) {
      float lo = std::min(p[a], std::min(p[3 + a], p[6 + a]));
      float hi = std::max(p[a], std::max(p[3 + a], p[6 + a]));
      tmin[3 * i + a] = lo;
      tmax[3 * i + a] = hi;
      center[3 * i + a] = 0.5f * (lo + hi);
    }
  }
  std::vector<uint64_t> keys((size_t)n_tris);
  for (int i = 0; i < n_tris; ++i)
    keys[i] = prim_key(tmin.data(), tmax.data(), i);
  for (int i = 0; i < n_tris; ++i) out_order[i] = i;

  Builder b;
  b.tmin = tmin.data();
  b.tmax = tmax.data();
  b.center = center.data();
  b.ids = out_order;
  b.key = keys.data();
  b.prev = (ctx && ctx->n_nodes > 0) ? ctx : nullptr;
  b.out_cmin = out_cmin;
  b.out_cmax = out_cmax;
  b.out_child = out_child;
  b.out_count = out_count;
  b.max_nodes = max_nodes;
  b.run(n_tris);
  *out_max_depth = b.max_depth + 2;
  if (out_reused_nodes) *out_reused_nodes = b.reused_nodes;
  if (b.overflow) return -1;
  if (ctx)
    snapshot_ctx(ctx, out_cmin, out_cmax, out_child, out_count, b.n_nodes,
                 out_order, keys.data(), n_tris);
  return b.n_nodes;
}

// ---------------------------------------------------------------------------
// Range allocator (strolle/src/utils/allocator.rs semantics): freed
// ranges are recycled first-fit; adjacent free ranges merge on
// compaction, which runs automatically when a take() misses.

namespace {
struct RangeAlloc {
  std::vector<std::pair<int64_t, int64_t>> free_list;  // (start, len)
  void compact() {
    std::sort(free_list.begin(), free_list.end());
    std::vector<std::pair<int64_t, int64_t>> out;
    for (auto &r : free_list) {
      if (!out.empty() && out.back().first + out.back().second == r.first)
        out.back().second += r.second;
      else
        out.push_back(r);
    }
    free_list.swap(out);
  }
  int64_t take(int64_t len) {
    for (int pass = 0; pass < 2; ++pass) {
      for (size_t i = 0; i < free_list.size(); ++i) {
        if (free_list[i].second >= len) {
          int64_t start = free_list[i].first;
          free_list[i].first += len;
          free_list[i].second -= len;
          if (free_list[i].second == 0) free_list.erase(free_list.begin() + i);
          return start;
        }
      }
      if (pass == 0) compact();
    }
    return -1;
  }
  void give(int64_t start, int64_t len) { free_list.push_back({start, len}); }
};
}  // namespace

API void *strolle_alloc_new(void) { return new RangeAlloc(); }
API void strolle_alloc_free(void *h) { delete (RangeAlloc *)h; }
API int64_t strolle_alloc_take(void *h, int64_t len) {
  return ((RangeAlloc *)h)->take(len);
}
API void strolle_alloc_give(void *h, int64_t start, int64_t len) {
  ((RangeAlloc *)h)->give(start, len);
}
API int64_t strolle_alloc_free_ranges(void *h) {
  auto *a = (RangeAlloc *)h;
  a->compact();
  return (int64_t)a->free_list.size();
}

// ---------------------------------------------------------------------------
// Guillotine rect-atlas allocator (the role guillotiere plays for the
// 8192² texture atlas, strolle/src/images.rs:29-43): best-shortest-
// side-fit free rect selection, guillotine split along the longer
// leftover axis. Freed rects return to the pool un-merged (same
// practical behavior as the reference's allocator under its
// insert-mostly workload).

namespace {
struct Guillotine {
  struct Rect {
    int32_t x, y, w, h;
  };
  std::vector<Rect> free_rects;
  Guillotine(int32_t w, int32_t h) { free_rects.push_back({0, 0, w, h}); }
  bool alloc(int32_t w, int32_t h, int32_t *ox, int32_t *oy) {
    int best = -1;
    int32_t best_score = INT32_MAX;
    for (size_t i = 0; i < free_rects.size(); ++i) {
      const Rect &r = free_rects[i];
      if (r.w < w || r.h < h) continue;
      int32_t score = std::min(r.w - w, r.h - h);
      if (score < best_score) {
        best_score = score;
        best = (int)i;
      }
    }
    if (best < 0) return false;
    Rect r = free_rects[best];
    free_rects.erase(free_rects.begin() + best);
    *ox = r.x;
    *oy = r.y;
    int32_t rw = r.w - w, rh = r.h - h;
    if (rw > rh) {  // split vertically: tall right strip + short bottom
      if (rw > 0) free_rects.push_back({r.x + w, r.y, rw, r.h});
      if (rh > 0) free_rects.push_back({r.x, r.y + h, w, rh});
    } else {  // split horizontally: wide bottom strip + short right
      if (rh > 0) free_rects.push_back({r.x, r.y + h, r.w, rh});
      if (rw > 0) free_rects.push_back({r.x + w, r.y, rw, h});
    }
    return true;
  }
  void free_rect(int32_t x, int32_t y, int32_t w, int32_t h) {
    free_rects.push_back({x, y, w, h});
  }
};
}  // namespace

API void *strolle_atlas_new(int32_t w, int32_t h) {
  return new Guillotine(w, h);
}
API void strolle_atlas_free(void *h) { delete (Guillotine *)h; }
API int strolle_atlas_alloc(void *h, int32_t w, int32_t hh, int32_t *x,
                            int32_t *y) {
  return ((Guillotine *)h)->alloc(w, hh, x, y) ? 0 : -1;
}
API void strolle_atlas_dealloc(void *h, int32_t x, int32_t y, int32_t w,
                               int32_t hh) {
  ((Guillotine *)h)->free_rect(x, y, w, hh);
}

// ---------------------------------------------------------------------------
// World-space instance transform: positions' = M·p (affine), normals'
// = normalize((M^-1)^T · n)  — mesh_triangle.rs:48-87 semantics.
// In-place over [T,3,3] arrays.

API int strolle_transform_triangles(float *positions, float *normals,
                                    int n_tris, const float *m4x4) {
  const float *m = m4x4;  // row-major 4x4
  // inverse-transpose of the upper 3x3
  float a = m[0], b = m[1], c = m[2];
  float d = m[4], e = m[5], f = m[6];
  float g = m[8], h = m[9], i = m[10];
  float det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
  if (std::fabs(det) < 1e-30f) return -1;
  float inv = 1.0f / det;
  // inv(M3)^T rows = cofactor matrix rows / det
  float n00 = (e * i - f * h) * inv, n01 = (f * g - d * i) * inv,
        n02 = (d * h - e * g) * inv;
  float n10 = (c * h - b * i) * inv, n11 = (a * i - c * g) * inv,
        n12 = (b * g - a * h) * inv;
  float n20 = (b * f - c * e) * inv, n21 = (c * d - a * f) * inv,
        n22 = (a * e - b * d) * inv;

  for (int t = 0; t < n_tris; ++t) {
    for (int v = 0; v < 3; ++v) {
      float *p = positions + (size_t)t * 9 + v * 3;
      float px = p[0], py = p[1], pz = p[2];
      p[0] = a * px + b * py + c * pz + m[3];
      p[1] = d * px + e * py + f * pz + m[7];
      p[2] = g * px + h * py + i * pz + m[11];
      float *n = normals + (size_t)t * 9 + v * 3;
      float nx = n[0], ny = n[1], nz = n[2];
      float ox = n00 * nx + n01 * ny + n02 * nz;
      float oy = n10 * nx + n11 * ny + n12 * nz;
      float oz = n20 * nx + n21 * ny + n22 * nz;
      float len = std::sqrt(ox * ox + oy * oy + oz * oz);
      if (len > 1e-20f) {
        ox /= len;
        oy /= len;
        oz /= len;
      }
      n[0] = ox;
      n[1] = oy;
      n[2] = oz;
    }
  }
  return 0;
}

API int strolle_native_abi_version(void) { return 1; }
