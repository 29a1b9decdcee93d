// Native BVH builder for raytpu.
//
// The reference delegates acceleration-structure builds to the GPU driver
// (wgpu build_acceleration_structures, src/state.rs:1241); raytpu owns the
// structure in software, and this C++ builder is the production path for
// the host-side build (the Python builder in accel/bvh.py stays as the
// readable fallback/reference — ~100x slower).
//
// Algorithm (mirrors accel/bvh.py):
//   * top-down binned SAH (16 bins), largest-extent axis first, remaining
//     axes as fallback; median split when centroids degenerate or beyond
//     depth 32 (bounds tree depth, hence the device traversal stack);
//   * leaves hold up to LEAF_SIZE triangles, assigned leaf rows in DFS
//     order (the shared triangle order for both device layouts);
//   * emission one: threaded (skip-link) binary layout in DFS pre-order;
//   * emission two: 8-wide collapse (expand the largest-area interior
//     cluster root until 8 slots), children packed per 128-lane row.
//
// C ABI only (loaded with ctypes): raytpu_bvh_build fills caller-allocated
// worst-case buffers and reports actual sizes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int N_BINS = 16;
constexpr int MAX_SAH_DEPTH = 32;
constexpr int BVH8_WIDTH = 8;

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Box {
  V3 lo{3.4e38f, 3.4e38f, 3.4e38f};
  V3 hi{-3.4e38f, -3.4e38f, -3.4e38f};
  void grow(const V3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  void grow(const Box &b) {
    lo = vmin(lo, b.lo);
    hi = vmax(hi, b.hi);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.0f);
    float dy = std::max(hi.y - lo.y, 0.0f);
    float dz = std::max(hi.z - lo.z, 0.0f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Rec {
  Box box;
  int left = -1;   // record index, -1 for leaf
  int right = -1;  // record index
  int first = -1;  // leaf: first index into ids scratch
  int count = 0;   // leaf: triangle count
};

struct Builder {
  const float *p0, *e1, *e2;
  int n;
  int leaf_size;
  std::vector<Box> tri_box;
  std::vector<V3> centroid;
  std::vector<int> ids;  // permuted in place by splits
  std::vector<Rec> recs;

  int build(int first, int count, int depth) {
    Box box;
    for (int i = 0; i < count; ++i) box.grow(tri_box[ids[first + i]]);

    int rec = (int)recs.size();
    recs.push_back({});
    recs[rec].box = box;

    int mid = -1;
    if (count > leaf_size) {
      if (depth < MAX_SAH_DEPTH) mid = sah_split(first, count);
      if (mid < 0) mid = count / 2;  // median fallback (order preserved)
    }
    if (mid < 0) {
      recs[rec].first = first;
      recs[rec].count = count;
      return rec;
    }
    int l = build(first, mid, depth + 1);
    int r = build(first + mid, count - mid, depth + 1);
    recs[rec].left = l;
    recs[rec].right = r;
    return rec;
  }

  // partitions ids[first..first+count) and returns the left count, or -1
  int sah_split(int first, int count) {
    V3 cmin{3.4e38f, 3.4e38f, 3.4e38f}, cmax{-3.4e38f, -3.4e38f, -3.4e38f};
    for (int i = 0; i < count; ++i) {
      const V3 &c = centroid[ids[first + i]];
      cmin = vmin(cmin, c);
      cmax = vmax(cmax, c);
    }
    float ext[3] = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
    int order[3] = {0, 1, 2};
    std::sort(order, order + 3, [&](int a, int b) { return ext[a] > ext[b]; });

    for (int oi = 0; oi < 3; ++oi) {
      int axis = order[oi];
      if (ext[axis] <= 0.0f) continue;
      float base = axis == 0 ? cmin.x : axis == 1 ? cmin.y : cmin.z;
      float scale = N_BINS * (1.0f - 1e-6f) / ext[axis];

      int counts[N_BINS] = {0};
      Box bins[N_BINS];
      for (int i = 0; i < count; ++i) {
        int t = ids[first + i];
        const V3 &c = centroid[t];
        float cc = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
        int b = std::min((int)((cc - base) * scale), N_BINS - 1);
        counts[b]++;
        bins[b].grow(tri_box[t]);
      }
      // sweep SAH cost of splitting after bin k
      float larea[N_BINS], rarea[N_BINS];
      int lcount[N_BINS];
      Box acc;
      int cnt = 0;
      for (int b = 0; b < N_BINS; ++b) {
        acc.grow(bins[b]);
        cnt += counts[b];
        larea[b] = acc.area();
        lcount[b] = cnt;
      }
      Box racc;
      for (int b = N_BINS - 1; b >= 0; --b) {
        racc.grow(bins[b]);
        rarea[b] = racc.area();
      }
      float best_cost = 3.4e38f;
      int best = -1;
      for (int b = 0; b < N_BINS - 1; ++b) {
        int lc = lcount[b], rc = count - lc;
        if (lc == 0 || rc == 0) continue;
        float cost = larea[b] * lc + rarea[b + 1] * rc;
        if (cost < best_cost) {
          best_cost = cost;
          best = b;
        }
      }
      if (best < 0) continue;
      // stable partition keeps id order inside each side deterministic
      std::vector<int> lt, rt;
      lt.reserve(count);
      rt.reserve(count);
      for (int i = 0; i < count; ++i) {
        int t = ids[first + i];
        const V3 &c = centroid[t];
        float cc = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
        int b = std::min((int)((cc - base) * scale), N_BINS - 1);
        (b <= best ? lt : rt).push_back(t);
      }
      std::copy(lt.begin(), lt.end(), ids.begin() + first);
      std::copy(rt.begin(), rt.end(), ids.begin() + first + (int)lt.size());
      return (int)lt.size();
    }
    return -1;
  }
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller allocates:
//   nodes8      [cap_nodes * 8]  f32  (threaded rows: bmin, bmax, miss,
//                                      leaf_row bitcast int32)
//   node8_rows  [cap_wide * 128] f32  (8-wide rows)
//   tri_order   [cap_order]      i32  (-1 padding)
// with cap_nodes >= 2*n+1, cap_wide >= n+1, cap_order >= n + (n+1)*leaf_size.
// out_counts = {n_nodes, n_wide, order_len}.
int raytpu_bvh_build(const float *p0, const float *e1, const float *e2,
                     int n, int leaf_size, float *nodes8, float *node8_rows,
                     int32_t *tri_order, int32_t *out_counts) {
  Builder B;
  B.p0 = p0;
  B.e1 = e1;
  B.e2 = e2;
  B.n = n;
  B.leaf_size = leaf_size;
  B.tri_box.resize(n);
  B.centroid.resize(n);
  B.ids.resize(n);
  for (int i = 0; i < n; ++i) {
    V3 a{p0[3 * i], p0[3 * i + 1], p0[3 * i + 2]};
    V3 b{a.x + e1[3 * i], a.y + e1[3 * i + 1], a.z + e1[3 * i + 2]};
    V3 c{a.x + e2[3 * i], a.y + e2[3 * i + 1], a.z + e2[3 * i + 2]};
    Box bb;
    bb.grow(a);
    bb.grow(b);
    bb.grow(c);
    B.tri_box[i] = bb;
    B.centroid[i] = {(bb.lo.x + bb.hi.x) * 0.5f, (bb.lo.y + bb.hi.y) * 0.5f,
                     (bb.lo.z + bb.hi.z) * 0.5f};
    B.ids[i] = i;
  }
  B.recs.reserve(2 * n + 1);
  int root = B.build(0, n, 0);

  // --- leaf rows in DFS order (shared triangle order) ---
  int n_recs = (int)B.recs.size();
  std::vector<int> leaf_row(n_recs, -1);
  int order_len = 0;
  {
    std::vector<int> stack{root};
    while (!stack.empty()) {
      int r = stack.back();
      stack.pop_back();
      const Rec &rec = B.recs[r];
      if (rec.left >= 0) {
        stack.push_back(rec.right);
        stack.push_back(rec.left);
      } else {
        leaf_row[r] = order_len / leaf_size;
        for (int i = 0; i < rec.count; ++i)
          tri_order[order_len + i] = B.ids[rec.first + i];
        int pad = (leaf_size - rec.count % leaf_size) % leaf_size;
        for (int i = 0; i < pad; ++i) tri_order[order_len + rec.count + i] = -1;
        order_len += rec.count + pad;
      }
    }
  }

  // --- threaded layout (DFS pre-order with miss links) ---
  int n_nodes = 0;
  {
    std::vector<int> flat_of(n_recs, -1);
    // (rec, miss_rec)
    std::vector<std::pair<int, int>> stack{{root, -1}}, emitted;
    emitted.reserve(n_recs);
    while (!stack.empty()) {
      auto [r, miss] = stack.back();
      stack.pop_back();
      flat_of[r] = (int)emitted.size();
      emitted.push_back({r, miss});
      const Rec &rec = B.recs[r];
      if (rec.left >= 0) {
        stack.push_back({rec.right, miss});
        stack.push_back({rec.left, rec.right});
      }
    }
    n_nodes = (int)emitted.size();
    for (int i = 0; i < n_nodes; ++i) {
      auto [r, miss] = emitted[i];
      const Rec &rec = B.recs[r];
      float *row = nodes8 + 8 * i;
      row[0] = rec.box.lo.x;
      row[1] = rec.box.lo.y;
      row[2] = rec.box.lo.z;
      row[3] = rec.box.hi.x;
      row[4] = rec.box.hi.y;
      row[5] = rec.box.hi.z;
      int32_t m = miss < 0 ? -1 : flat_of[miss];
      int32_t lr = rec.left >= 0 ? -1 : leaf_row[r];
      std::memcpy(row + 6, &m, 4);
      std::memcpy(row + 7, &lr, 4);
    }
  }

  // --- 8-wide collapse ---
  int n_wide = 0;
  {
    auto children_of = [&](int rec) {
      std::vector<int> slots;
      const Rec &r = B.recs[rec];
      if (r.left < 0) {
        slots.push_back(rec);
        return slots;
      }
      slots = {r.left, r.right};
      while ((int)slots.size() < BVH8_WIDTH) {
        int best = -1;
        float best_a = -1.0f;
        for (int i = 0; i < (int)slots.size(); ++i) {
          const Rec &s = B.recs[slots[i]];
          if (s.left >= 0 && s.box.area() > best_a) {
            best_a = s.box.area();
            best = i;
          }
        }
        if (best < 0) break;
        int s = slots[best];
        slots.erase(slots.begin() + best);
        slots.push_back(B.recs[s].left);
        slots.push_back(B.recs[s].right);
      }
      return slots;
    };

    std::vector<int> order{root};
    std::vector<int> wide_index(n_recs, -1);
    wide_index[root] = 0;
    std::vector<std::vector<int>> node_children;
    for (size_t qi = 0; qi < order.size(); ++qi) {
      auto slots = children_of(order[qi]);
      for (int s : slots) {
        if (B.recs[s].left >= 0) {
          wide_index[s] = (int)order.size();
          order.push_back(s);
        }
      }
      node_children.push_back(std::move(slots));
    }
    n_wide = (int)order.size();
    for (int ni = 0; ni < n_wide; ++ni) {
      float *row = node8_rows + 128 * ni;
      std::memset(row, 0, 128 * sizeof(float));
      for (int k = 0; k < BVH8_WIDTH; ++k) {  // empty: inverted box
        row[16 * k + 0] = row[16 * k + 1] = row[16 * k + 2] = 1.0f;
        row[16 * k + 3] = row[16 * k + 4] = row[16 * k + 5] = -1.0f;
      }
      const auto &slots = node_children[ni];
      for (int k = 0; k < (int)slots.size(); ++k) {
        const Rec &s = B.recs[slots[k]];
        row[16 * k + 0] = s.box.lo.x;
        row[16 * k + 1] = s.box.lo.y;
        row[16 * k + 2] = s.box.lo.z;
        row[16 * k + 3] = s.box.hi.x;
        row[16 * k + 4] = s.box.hi.y;
        row[16 * k + 5] = s.box.hi.z;
        int32_t link = s.left >= 0 ? wide_index[slots[k]]
                                   : ~leaf_row[slots[k]];
        std::memcpy(row + 16 * k + 6, &link, 4);
      }
    }
  }

  out_counts[0] = n_nodes;
  out_counts[1] = n_wide;
  out_counts[2] = order_len;
  return 0;
}
}
