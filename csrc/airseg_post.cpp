// airseg_post — native post-processing kernels for the TPU airway framework.
//
// TPU-native equivalents of the third-party native components the
// reference leans on (SURVEY.md §2.9): connected-components-3d (cc3d),
// skimage skeletonize_3d, and the hysteresis "double threshold
// iteration" that the reference implements as a pure-Python triple loop
// (reference train.py:25-49 — three identical copies). These run on the
// host after device inference; everything here is single-pass cache-
// friendly C++ exported with a C ABI for ctypes.
//
// Build: make -C csrc   (produces libairseg_post.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find connected components (6- or 26-connectivity), two-pass.
// Replaces cc3d.connected_components (reference util.py:59, train.py:750,
// test.py:245, weight_br.py:153). Labels are 1..n in first-encounter order;
// returns the number of components.
// ---------------------------------------------------------------------------

static inline uint32_t uf_find(std::vector<uint32_t>& parent, uint32_t x) {
  uint32_t root = x;
  while (parent[root] != root) root = parent[root];
  while (parent[x] != root) { uint32_t next = parent[x]; parent[x] = root; x = next; }
  return root;
}

static inline void uf_union(std::vector<uint32_t>& parent, uint32_t a, uint32_t b) {
  a = uf_find(parent, a);
  b = uf_find(parent, b);
  if (a != b) parent[std::max(a, b)] = std::min(a, b);
}

int64_t cc3d_label(const uint8_t* in, int64_t d, int64_t h, int64_t w,
                   int connectivity, uint32_t* out) {
  const int64_t hw = h * w;
  const int64_t n = d * hw;
  std::memset(out, 0, sizeof(uint32_t) * n);
  std::vector<uint32_t> parent(1, 0);

  // backward half-neighborhood (offsets with lexicographically negative
  // leading term) — 13 for 26-conn, 3 for 6-conn
  int offs[13][3];
  int n_off = 0;
  if (connectivity == 6) {
    int tmp[3][3] = {{-1, 0, 0}, {0, -1, 0}, {0, 0, -1}};
    for (auto& t : tmp) { offs[n_off][0] = t[0]; offs[n_off][1] = t[1]; offs[n_off][2] = t[2]; n_off++; }
  } else {
    for (int dz = -1; dz <= 0; dz++)
      for (int dy = -1; dy <= 1; dy++)
        for (int dx = -1; dx <= 1; dx++) {
          if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
          offs[n_off][0] = dz; offs[n_off][1] = dy; offs[n_off][2] = dx; n_off++;
        }
  }

  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++)
      for (int64_t x = 0; x < w; x++) {
        const int64_t i = z * hw + y * w + x;
        if (!in[i]) continue;
        uint32_t lbl = 0;
        for (int k = 0; k < n_off; k++) {
          const int64_t zz = z + offs[k][0], yy = y + offs[k][1], xx = x + offs[k][2];
          if (zz < 0 || yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
          const uint32_t nl = out[zz * hw + yy * w + xx];
          if (!nl) continue;
          if (!lbl) lbl = nl;
          else if (nl != lbl) uf_union(parent, lbl, nl);
        }
        if (!lbl) {
          lbl = (uint32_t)parent.size();
          parent.push_back(lbl);
        }
        out[i] = lbl;
      }

  // flatten + relabel compactly in first-encounter order
  std::vector<uint32_t> remap(parent.size(), 0);
  uint32_t next = 0;
  for (int64_t i = 0; i < n; i++) {
    if (!out[i]) continue;
    const uint32_t r = uf_find(parent, out[i]);
    if (!remap[r]) remap[r] = ++next;
    out[i] = remap[r];
  }
  return (int64_t)next;
}

// component voxel counts for labels 1..n_labels
void cc3d_counts(const uint32_t* labels, int64_t n, int64_t n_labels,
                 int64_t* counts) {
  std::memset(counts, 0, sizeof(int64_t) * n_labels);
  for (int64_t i = 0; i < n; i++)
    if (labels[i]) counts[labels[i] - 1]++;
}

// ---------------------------------------------------------------------------
// Double-threshold iteration — EXACT reference semantics.
//
// The reference's while-loop aliasing executes exactly one full raster
// sweep in which newly-promoted voxels immediately seed later voxels of
// the same sweep (in-place propagation; reference train.py:25-49).
// Neighbor coordinates are CLAMPED to the volume (not skipped), and the
// comparison runs on pred*255 in float32 — all reproduced here.
// ---------------------------------------------------------------------------

void dti_sweep(const float* pred, int64_t d, int64_t h, int64_t w,
               float h_thresh, float l_thresh, uint8_t* out) {
  const int64_t hw = h * w;
  const float hi = h_thresh * 255.0f, lo = l_thresh * 255.0f;
  const int64_t n = d * hw;
  for (int64_t i = 0; i < n; i++) {
    const float v = (float)(pred[i] * 255.0f);
    out[i] = v >= hi ? 1 : 0;
  }
  static const int nb[26][3] = {
      {-1,-1,0},{-1,0,0},{-1,1,0},{0,-1,0},{0,1,0},{1,-1,0},{1,0,0},{1,1,0},
      {-1,-1,-1},{-1,0,-1},{-1,1,-1},{0,-1,-1},{0,0,-1},{0,1,-1},{1,-1,-1},{1,0,-1},{1,1,-1},
      {-1,-1,1},{-1,0,1},{-1,1,1},{0,-1,1},{0,0,1},{0,1,1},{1,-1,1},{1,0,1},{1,1,1}};
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++)
      for (int64_t x = 0; x < w; x++) {
        const int64_t i = z * hw + y * w + x;
        if (out[i]) continue;
        const float v = (float)(pred[i] * 255.0f);
        if (v >= hi || v < lo) continue;
        for (int k = 0; k < 26; k++) {
          int64_t zz = z + nb[k][0], yy = y + nb[k][1], xx = x + nb[k][2];
          zz = std::max<int64_t>(0, std::min<int64_t>(zz, d - 1));
          yy = std::max<int64_t>(0, std::min<int64_t>(yy, h - 1));
          xx = std::max<int64_t>(0, std::min<int64_t>(xx, w - 1));
          if (out[zz * hw + yy * w + xx]) { out[i] = 1; break; }
        }
      }
}

// ---------------------------------------------------------------------------
// 3-D medial-axis thinning (curve skeleton).
//
// Replaces skimage.morphology.skeletonize_3d (reference ske_and_parse.py:83,
// weight_br.py:128, ours_skel_parse.py:580). Directional-subiteration
// thinning in the (26, 6) digital topology: per sub-iteration, border
// points of one of the 6 face directions that are simple and not curve
// endpoints are collected in a raster pass, then deleted sequentially
// with a simplicity re-check (the standard Lee-et-al. style schedule;
// the Euler-invariant + octree test is replaced by the equivalent
// Bertrand–Malandain simple-point characterization computed directly on
// the 3x3x3 neighborhood).
// ---------------------------------------------------------------------------

namespace {

// gather the 3x3x3 neighborhood (center at index 13) with zero padding
static inline void gather27(const uint8_t* img, int64_t d, int64_t h, int64_t w,
                            int64_t z, int64_t y, int64_t x, uint8_t nb[27]) {
  const int64_t hw = h * w;
  int idx = 0;
  for (int dz = -1; dz <= 1; dz++)
    for (int dy = -1; dy <= 1; dy++)
      for (int dx = -1; dx <= 1; dx++, idx++) {
        const int64_t zz = z + dz, yy = y + dy, xx = x + dx;
        nb[idx] = (zz < 0 || zz >= d || yy < 0 || yy >= h || xx < 0 || xx >= w)
                      ? 0
                      : img[zz * hw + yy * w + xx];
      }
}

static inline int coord(int dz, int dy, int dx) {
  return (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1);
}

// condition (a): exactly one 26-component of foreground among the 26
// neighbors (center excluded)
static bool one_fg_component26(const uint8_t nb[27]) {
  bool fg[27];
  int count = 0;
  for (int i = 0; i < 27; i++) fg[i] = (i != 13) && nb[i];
  int seen[27], n_seen = 0;
  bool visited[27] = {false};
  int comps = 0;
  for (int s = 0; s < 27; s++) {
    if (!fg[s] || visited[s]) continue;
    comps++;
    if (comps > 1) return false;
    // BFS within the 26-neighborhood
    n_seen = 0;
    seen[n_seen++] = s;
    visited[s] = true;
    for (int q = 0; q < n_seen; q++) {
      const int c = seen[q];
      const int cz = c / 9 - 1, cy = (c / 3) % 3 - 1, cx = c % 3 - 1;
      for (int dz = -1; dz <= 1; dz++)
        for (int dy = -1; dy <= 1; dy++)
          for (int dx = -1; dx <= 1; dx++) {
            if (!dz && !dy && !dx) continue;
            const int zz = cz + dz, yy = cy + dy, xx = cx + dx;
            if (zz < -1 || zz > 1 || yy < -1 || yy > 1 || xx < -1 || xx > 1) continue;
            const int t = coord(zz, yy, xx);
            if (fg[t] && !visited[t]) { visited[t] = true; seen[n_seen++] = t; }
          }
    }
    (void)count;
  }
  return comps == 1;
}

// condition (b): exactly one 6-component of background within the
// 18-neighborhood that is 6-adjacent to the center
static bool one_bg_component6(const uint8_t nb[27]) {
  // 18-neighborhood: |dz|+|dy|+|dx| <= 2, excluding center
  auto in18 = [](int i) {
    const int dz = i / 9 - 1, dy = (i / 3) % 3 - 1, dx = i % 3 - 1;
    const int m = std::abs(dz) + std::abs(dy) + std::abs(dx);
    return m >= 1 && m <= 2;
  };
  bool bg[27];
  for (int i = 0; i < 27; i++) bg[i] = in18(i) && !nb[i];
  static const int faces[6] = {coord(-1,0,0), coord(1,0,0), coord(0,-1,0),
                               coord(0,1,0), coord(0,0,-1), coord(0,0,1)};
  bool visited[27] = {false};
  int comps = 0;
  for (int f = 0; f < 6; f++) {
    const int s = faces[f];
    if (!bg[s] || visited[s]) continue;
    comps++;
    if (comps > 1) return false;
    int seen[27], n_seen = 0;
    seen[n_seen++] = s;
    visited[s] = true;
    for (int q = 0; q < n_seen; q++) {
      const int c = seen[q];
      const int cz = c / 9 - 1, cy = (c / 3) % 3 - 1, cx = c % 3 - 1;
      static const int d6[6][3] = {{-1,0,0},{1,0,0},{0,-1,0},{0,1,0},{0,0,-1},{0,0,1}};
      for (auto& dd : d6) {
        const int zz = cz + dd[0], yy = cy + dd[1], xx = cx + dd[2];
        if (zz < -1 || zz > 1 || yy < -1 || yy > 1 || xx < -1 || xx > 1) continue;
        const int t = coord(zz, yy, xx);
        if (bg[t] && !visited[t]) { visited[t] = true; seen[n_seen++] = t; }
      }
    }
  }
  return comps == 1;
}

static inline bool is_simple(const uint8_t nb[27]) {
  return one_fg_component26(nb) && one_bg_component6(nb);
}

static inline int count_neighbors26(const uint8_t nb[27]) {
  int c = 0;
  for (int i = 0; i < 27; i++) c += (i != 13) && nb[i];
  return c;
}

}  // namespace

void skeletonize3d(uint8_t* img, int64_t d, int64_t h, int64_t w) {
  const int64_t hw = h * w;
  // 6 face directions in Lee's N, S, E, W, U, B schedule on (z, y, x)
  // volumes: y-, y+, x+, x-, z+, z- — the same sub-iteration order the
  // published algorithm (and its skimage port) uses. The order matters:
  // it decides which of two competing simple points erodes first, and
  // therefore the final branch geometry (CASE073 parity).
  static const int dirs[6][3] = {{0,-1,0},{0,1,0},{0,0,1},{0,0,-1},{1,0,0},{-1,0,0}};
  std::vector<int64_t> active;
  active.reserve(1 << 20);
  for (int64_t i = 0, n = d * hw; i < n; i++)
    if (img[i]) active.push_back(i);

  std::vector<int64_t> candidates;
  bool changed = true;
  while (changed) {
    changed = false;
    for (int dir = 0; dir < 6; dir++) {
      candidates.clear();
      for (int64_t i : active) {
        if (!img[i]) continue;
        const int64_t z = i / hw, y = (i / w) % h, x = i % w;
        // border point in this direction: the face neighbor is background
        const int64_t zz = z + dirs[dir][0], yy = y + dirs[dir][1], xx = x + dirs[dir][2];
        const bool nb_bg = (zz < 0 || zz >= d || yy < 0 || yy >= h ||
                            xx < 0 || xx >= w) || !img[zz * hw + yy * w + xx];
        if (!nb_bg) continue;
        uint8_t nb[27];
        gather27(img, d, h, w, z, y, x, nb);
        if (count_neighbors26(nb) == 1) continue;  // curve endpoint: keep
        if (!is_simple(nb)) continue;
        candidates.push_back(i);
      }
      // sequential re-check: earlier deletions may invalidate
      // simplicity. NOTE: like Lee's schedule (and skimage's port),
      // only SIMPLICITY is re-checked here — a candidate that became
      // an endpoint mid-sweep is still deleted; re-checking the
      // endpoint condition here preserves extra spur tips (~13% more
      // terminal branches measured on the CASE073 demo).
      for (int64_t i : candidates) {
        const int64_t z = i / hw, y = (i / w) % h, x = i % w;
        uint8_t nb[27];
        gather27(img, d, h, w, z, y, x, nb);
        if (!is_simple(nb)) continue;
        img[i] = 0;
        changed = true;
      }
    }
    if (changed) {
      // compact the active set to surviving voxels
      std::vector<int64_t> next;
      next.reserve(active.size());
      for (int64_t i : active)
        if (img[i]) next.push_back(i);
      active.swap(next);
    }
  }
}

// ---------------------------------------------------------------------------
// Exact squared Euclidean distance transform with nearest-feature indices
// (Felzenszwalb–Huttenlocher lower-envelope, 3 separable passes).
// Replaces scipy.ndimage.distance_transform_edt(return_indices=True)
// (reference weight_br.py:132, 159; ours_skel_parse.py:517; data.py:304).
// Computes, for every voxel, the squared distance to the nearest zero
// voxel of `in` and that voxel's linear index.
// ---------------------------------------------------------------------------

namespace {

// 1-D squared-distance lower envelope over a strided line.
// f: input costs; out_d: output; out_arg: index (along the line) of the
// nearest parabola source.
static void edt_1d(const float* f, float* out_d, int32_t* out_arg, int n,
                   std::vector<int>& v, std::vector<float>& zbuf) {
  v.resize(n);
  zbuf.resize(n + 1);
  int k = 0;
  v[0] = 0;
  zbuf[0] = -1e30f;
  zbuf[1] = 1e30f;
  for (int q = 1; q < n; q++) {
    if (f[q] >= 1e29f && f[v[k]] >= 1e29f) { continue; }
    float s;
    while (true) {
      const int p = v[k];
      s = ((f[q] + q * (float)q) - (f[p] + p * (float)p)) / (2.0f * (q - p));
      if (s <= zbuf[k]) { k--; continue; }
      break;
    }
    k++;
    v[k] = q;
    zbuf[k] = s;
    zbuf[k + 1] = 1e30f;
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (zbuf[k + 1] < q) k++;
    const int p = v[k];
    out_d[q] = (q - p) * (float)(q - p) + f[p];
    out_arg[q] = p;
  }
}

}  // namespace

// out_dist: squared distances (float32). out_idx: 3 planes (z,y,x source
// coords, int32), each d*h*w. Pass out_idx=null to skip index tracking.
void edt_sq(const uint8_t* in, int64_t d, int64_t h, int64_t w,
            float* out_dist, int32_t* out_idx) {
  const int64_t hw = h * w, n = d * hw;
  const float INF = 1e30f;
  std::vector<float> f, dline;
  std::vector<int32_t> arg;
  std::vector<int> v;
  std::vector<float> zbuf;
  // feature coordinate planes
  int32_t* iz = out_idx ? out_idx : nullptr;
  int32_t* iy = out_idx ? out_idx + n : nullptr;
  int32_t* ix = out_idx ? out_idx + 2 * n : nullptr;

  for (int64_t i = 0; i < n; i++) out_dist[i] = in[i] ? INF : 0.0f;
  if (out_idx)
    for (int64_t i = 0; i < n; i++) {
      iz[i] = (int32_t)(i / hw);
      iy[i] = (int32_t)((i / w) % h);
      ix[i] = (int32_t)(i % w);
    }

  // pass 1: along x
  f.resize(w); dline.resize(w); arg.resize(w);
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++) {
      float* row = out_dist + z * hw + y * w;
      edt_1d(row, dline.data(), arg.data(), (int)w, v, zbuf);
      for (int64_t x = 0; x < w; x++) {
        row[x] = dline[x];
        if (out_idx) ix[z * hw + y * w + x] = arg[x];
      }
    }

  // pass 2: along y
  f.resize(h); dline.resize(h); arg.resize(h);
  std::vector<int32_t> src_x(h), src_z1(h);
  for (int64_t z = 0; z < d; z++)
    for (int64_t x = 0; x < w; x++) {
      for (int64_t y = 0; y < h; y++) f[y] = out_dist[z * hw + y * w + x];
      edt_1d(f.data(), dline.data(), arg.data(), (int)h, v, zbuf);
      if (out_idx)
        for (int64_t y = 0; y < h; y++) src_x[y] = ix[z * hw + arg[y] * w + x];
      for (int64_t y = 0; y < h; y++) {
        out_dist[z * hw + y * w + x] = dline[y];
        if (out_idx) {
          iy[z * hw + y * w + x] = arg[y];
          ix[z * hw + y * w + x] = src_x[y];
        }
      }
    }

  // pass 3: along z
  f.resize(d); dline.resize(d); arg.resize(d);
  std::vector<int32_t> sx(d), sy(d);
  for (int64_t y = 0; y < h; y++)
    for (int64_t x = 0; x < w; x++) {
      for (int64_t z = 0; z < d; z++) f[z] = out_dist[z * hw + y * w + x];
      edt_1d(f.data(), dline.data(), arg.data(), (int)d, v, zbuf);
      if (out_idx)
        for (int64_t z = 0; z < d; z++) {
          sx[z] = ix[arg[z] * hw + y * w + x];
          sy[z] = iy[arg[z] * hw + y * w + x];
        }
      for (int64_t z = 0; z < d; z++) {
        out_dist[z * hw + y * w + x] = dline[z];
        if (out_idx) {
          iz[z * hw + y * w + x] = arg[z];
          iy[z * hw + y * w + x] = sy[z];
          ix[z * hw + y * w + x] = sx[z];
        }
      }
    }
}

// ---------------------------------------------------------------------------
// Isosurface extraction: marching tetrahedra.
//
// Replaces skimage.measure.marching_cubes for the STL export path
// (reference prediction.py:126-145, ours_skel_parse.py:1023-1046).
// Each cell is split into 6 tetrahedra; per-tetrahedron triangulation
// has only 3 case classes (1-inside -> 1 tri, 2-inside -> 2 tris),
// derived programmatically — no lookup tables. Produces a watertight
// triangle soup at the `level` isosurface with linear interpolation.
//
// Two-phase API (count, then fill caller-allocated buffer):
//   n_tris = march_tets(vol, d, h, w, level, nullptr, 0)
//   march_tets(vol, d, h, w, level, out, n_tris)   // out: n*9 floats
// ---------------------------------------------------------------------------

namespace {

struct V3 { float x, y, z; };

static inline V3 lerp_iso(const float* vol, int64_t hw, int64_t w,
                          int az, int ay, int ax, int bz, int by, int bx,
                          float level) {
  const float va = vol[az * hw + ay * w + ax];
  const float vb = vol[bz * hw + by * w + bx];
  float t = (level - va) / (vb - va);
  if (t < 0.f) t = 0.f;
  if (t > 1.f) t = 1.f;
  return V3{az + t * (bz - az), ay + t * (by - ay), ax + t * (bx - ax)};
}

}  // namespace

extern "C" int64_t march_tets(const float* vol, int64_t d, int64_t h, int64_t w,
                              float level, float* out, int64_t capacity) {
  const int64_t hw = h * w;
  // cube corners (dz, dy, dx)
  static const int C[8][3] = {{0,0,0},{0,0,1},{0,1,0},{0,1,1},
                              {1,0,0},{1,0,1},{1,1,0},{1,1,1}};
  // 6-tetrahedra decomposition of the cube around the main diagonal 0-7
  static const int T[6][4] = {{0,1,3,7},{0,3,2,7},{0,2,6,7},
                              {0,6,4,7},{0,4,5,7},{0,5,1,7}};
  int64_t n = 0;
  auto emit = [&](const V3& a, const V3& b, const V3& c) {
    if (out && n < capacity) {
      float* t = out + n * 9;
      t[0]=a.z; t[1]=a.y; t[2]=a.x;  // store as (z,y,x) triplets
      t[3]=b.z; t[4]=b.y; t[5]=b.x;
      t[6]=c.z; t[7]=c.y; t[8]=c.x;
    }
    n++;
  };
  for (int64_t z = 0; z + 1 < d; z++)
    for (int64_t y = 0; y + 1 < h; y++)
      for (int64_t x = 0; x + 1 < w; x++) {
        float vals[8];
        bool any_in = false, any_out = false;
        for (int k = 0; k < 8; k++) {
          vals[k] = vol[(z + C[k][0]) * hw + (y + C[k][1]) * w + (x + C[k][2])];
          (vals[k] > level ? any_in : any_out) = true;
        }
        if (!any_in || !any_out) continue;
        for (auto& tet : T) {
          int in_ids[4], out_ids[4];
          int ni = 0, no = 0;
          for (int k = 0; k < 4; k++) {
            if (vals[tet[k]] > level) in_ids[ni++] = tet[k];
            else out_ids[no++] = tet[k];
          }
          if (ni == 0 || ni == 4) continue;
          auto P = [&](int a, int b) {
            return lerp_iso(vol, hw, w,
                            (int)(z + C[a][0]), (int)(y + C[a][1]), (int)(x + C[a][2]),
                            (int)(z + C[b][0]), (int)(y + C[b][1]), (int)(x + C[b][2]),
                            level);
          };
          if (ni == 1) {
            emit(P(in_ids[0], out_ids[0]), P(in_ids[0], out_ids[1]),
                 P(in_ids[0], out_ids[2]));
          } else if (ni == 3) {
            emit(P(in_ids[0], out_ids[0]), P(in_ids[1], out_ids[0]),
                 P(in_ids[2], out_ids[0]));
          } else {  // ni == 2: quad -> 2 triangles
            V3 p00 = P(in_ids[0], out_ids[0]);
            V3 p01 = P(in_ids[0], out_ids[1]);
            V3 p10 = P(in_ids[1], out_ids[0]);
            V3 p11 = P(in_ids[1], out_ids[1]);
            emit(p00, p01, p11);
            emit(p00, p11, p10);
          }
        }
      }
  return n;
}

// ---------------------------------------------------------------------------
// Morphology primitives matching scipy.ndimage defaults (SURVEY.md §2.9;
// reference call sites preprocessing/util/weight_br). Face connectivity
// (conn-1 structure) throughout — scipy's default for binary_fill_holes
// and binary_dilation. 2-D callers pass d == 1 (the z direction then
// simply contributes no neighbors).
// ---------------------------------------------------------------------------

extern "C" void fill_holes(const uint8_t* in, int64_t d, int64_t h, int64_t w,
                           int seed_z, uint8_t* out) {
  // out = in | (background not face-connected to the volume border):
  // one BFS flood from every border background voxel, then invert.
  // Equivalent to scipy.ndimage.binary_fill_holes(in) with the default
  // conn-1 structure (reference preprocessing.py / util.py fill sites).
  // 2-D callers pass d == 1 with seed_z == 0: a 2-D image has no
  // z-border, so the z faces (== every voxel) must not seed the flood.
  const int64_t hw = h * w;
  const int64_t n = d * hw;
  std::vector<uint8_t> reach(n, 0);
  std::vector<int64_t> stack;
  stack.reserve(static_cast<size_t>(2 * (hw + d * w + d * h)));
  auto push = [&](int64_t idx) {
    if (!in[idx] && !reach[idx]) { reach[idx] = 1; stack.push_back(idx); }
  };
  if (seed_z)
    for (int64_t y = 0; y < h; y++)
      for (int64_t x = 0; x < w; x++) {
        push(y * w + x);
        push((d - 1) * hw + y * w + x);
      }
  for (int64_t z = 0; z < d; z++)
    for (int64_t x = 0; x < w; x++) {
      push(z * hw + x);
      push(z * hw + (h - 1) * w + x);
    }
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++) {
      push(z * hw + y * w);
      push(z * hw + y * w + (w - 1));
    }
  while (!stack.empty()) {
    const int64_t idx = stack.back();
    stack.pop_back();
    const int64_t z = idx / hw, r = idx % hw, y = r / w, x = r % w;
    if (z > 0) push(idx - hw);
    if (z + 1 < d) push(idx + hw);
    if (y > 0) push(idx - w);
    if (y + 1 < h) push(idx + w);
    if (x > 0) push(idx - 1);
    if (x + 1 < w) push(idx + 1);
  }
  for (int64_t i = 0; i < n; i++) out[i] = in[i] || !reach[i];
}

extern "C" void binary_dilate6(const uint8_t* in, int64_t d, int64_t h,
                               int64_t w, uint8_t* out) {
  // One iteration of binary dilation with scipy's default conn-1
  // (6-neighborhood cross) structure (reference weight_br.py:166).
  const int64_t hw = h * w;
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++) {
      const int64_t base = z * hw + y * w;
      for (int64_t x = 0; x < w; x++) {
        const int64_t idx = base + x;
        uint8_t v = in[idx];
        if (!v && z > 0) v = in[idx - hw];
        if (!v && z + 1 < d) v = in[idx + hw];
        if (!v && y > 0) v = in[idx - w];
        if (!v && y + 1 < h) v = in[idx + w];
        if (!v && x > 0) v = in[idx - 1];
        if (!v && x + 1 < w) v = in[idx + 1];
        out[idx] = v ? 1 : 0;
      }
    }
}

extern "C" void binary_erode6(const uint8_t* in, int64_t d, int64_t h,
                              int64_t w, uint8_t* out) {
  // One iteration of binary erosion, conn-1 structure, scipy's default
  // border_value=0 (out-of-bounds counts as background, so border
  // foreground erodes). With binary_dilate6 this composes scipy's
  // binary_closing (reference ours_skel_parse.py:573).
  const int64_t hw = h * w;
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++) {
      const int64_t base = z * hw + y * w;
      for (int64_t x = 0; x < w; x++) {
        const int64_t idx = base + x;
        uint8_t v = in[idx];
        if (v) {
          v = (z > 0 && in[idx - hw]) && (z + 1 < d && in[idx + hw]) &&
              (y > 0 && in[idx - w]) && (y + 1 < h && in[idx + w]) &&
              (x > 0 && in[idx - 1]) && (x + 1 < w && in[idx + 1]);
        }
        out[idx] = v;
      }
    }
}

extern "C" void label_bboxes(const int32_t* labels, int64_t d, int64_t h,
                             int64_t w, int64_t num, int64_t* out) {
  // Per-label bounding boxes in one raster pass, replacing
  // scipy.ndimage.find_objects (reference atm22_skel_parse.py:120).
  // out is (num, 6) int64 rows [z0, z1, y0, y1, x0, x1) half-open;
  // labels that never occur get z0 == -1.
  for (int64_t i = 0; i < num; i++) {
    int64_t* r = out + i * 6;
    r[0] = -1; r[1] = 0; r[2] = -1; r[3] = 0; r[4] = -1; r[5] = 0;
  }
  const int64_t hw = h * w;
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++) {
      const int32_t* row = labels + z * hw + y * w;
      for (int64_t x = 0; x < w; x++) {
        const int32_t v = row[x];
        if (v <= 0 || v > num) continue;
        int64_t* r = out + (v - 1) * 6;
        if (r[0] < 0) { r[0] = z; r[2] = y; r[4] = x; r[1] = z + 1; r[3] = y + 1; r[5] = x + 1; }
        else {
          if (z < r[0]) r[0] = z;
          if (z + 1 > r[1]) r[1] = z + 1;
          if (y < r[2]) r[2] = y;
          if (y + 1 > r[3]) r[3] = y + 1;
          if (x < r[4]) r[4] = x;
          if (x + 1 > r[5]) r[5] = x + 1;
        }
      }
    }
}

extern "C" void box_convolve27(const float* in, int64_t d, int64_t h,
                               int64_t w, float* out) {
  // 3x3x3 all-ones convolution with scipy ndimage.convolve's default
  // 'reflect' boundary — for +-1 offsets reflect is edge-clamp
  // (-1 -> 0, n -> n-1). Separable: three clamped 1-D box passes
  // (reference weight_br.py:157 degree test on the skeleton).
  const int64_t hw = h * w;
  const int64_t n = d * hw;
  std::vector<float> t1(n), t2(n);
  // pass 1: along x
  for (int64_t zy = 0; zy < d * h; zy++) {
    const float* row = in + zy * w;
    float* orow = t1.data() + zy * w;
    for (int64_t x = 0; x < w; x++) {
      const int64_t xm = x > 0 ? x - 1 : 0;
      const int64_t xp = x + 1 < w ? x + 1 : w - 1;
      orow[x] = row[xm] + row[x] + row[xp];
    }
  }
  // pass 2: along y
  for (int64_t z = 0; z < d; z++)
    for (int64_t y = 0; y < h; y++) {
      const int64_t ym = y > 0 ? y - 1 : 0;
      const int64_t yp = y + 1 < h ? y + 1 : h - 1;
      const float* a = t1.data() + z * hw + ym * w;
      const float* b = t1.data() + z * hw + y * w;
      const float* c = t1.data() + z * hw + yp * w;
      float* orow = t2.data() + z * hw + y * w;
      for (int64_t x = 0; x < w; x++) orow[x] = a[x] + b[x] + c[x];
    }
  // pass 3: along z
  for (int64_t z = 0; z < d; z++) {
    const int64_t zm = z > 0 ? z - 1 : 0;
    const int64_t zp = z + 1 < d ? z + 1 : d - 1;
    const float* a = t2.data() + zm * hw;
    const float* b = t2.data() + z * hw;
    const float* c = t2.data() + zp * hw;
    float* orow = out + z * hw;
    for (int64_t x = 0; x < hw; x++) orow[x] = a[x] + b[x] + c[x];
  }
}

}  // extern "C"
