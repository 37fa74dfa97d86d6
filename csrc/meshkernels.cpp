// Native mesh kernels for pelvistim_fem_tpu.
//
// The reference delegates its mesh-heavy work to external native tools
// (Gmsh C++ mesher, ElmerGrid converter — SURVEY.md EXT-A/EXT-B); here the
// equivalent hot host-side passes are in-framework C++, called through
// ctypes (pelvistim_fem_tpu/native.py) with a pure-numpy fallback:
//
//   extract_boundary     external faces = faces appearing in exactly one
//                        tet (the invariant of the reference's
//                        find_boundaries.py:48-59), via a radix-style sort
//   accumulate_stencil   scatter element stiffnesses into per-body
//                        27-point stencil coefficient stacks (the host
//                        assembly feeding ops/stencil.py)
//   parse_elmer_nodes /  fast text parsing of the Elmer mesh DB
//   parse_elmer_elements (setup_case.py:35-63 formats)
//
// Build: make -C csrc   (produces ../pelvistim_fem_tpu/_native.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Local faces of a tet, outward-oriented for positive volumes
// (must match pelvistim_fem_tpu/mesh/boundary.py TET_FACES).
static const int TET_FACES[4][3] = {
    {1, 2, 3}, {0, 3, 2}, {0, 1, 3}, {0, 2, 1}};

struct FaceKey {
  int32_t a, b, c;   // sorted node ids
  int64_t src;       // 4*tet + local face
};

// Find faces appearing exactly once.  tets: (m,4) int32.
// out_faces: caller-allocated (4m,3); out_parent: (4m,).
// Returns the number of boundary faces written.
//
// Fast path: when node ids fit in 21 bits (< 2.1M nodes — true for
// every model incl. the 1.18M-node pelvic megatet), the sorted face
// triple packs into one 63-bit key and an 11-bit LSD radix sort
// replaces std::sort (~4x on 7M faces, single host core).  The output
// order (key-ascending) is identical to the comparison sort's.
static int64_t emit_singletons(const int32_t* tets, int64_t n,
                               const uint64_t* keys, const int64_t* srcs,
                               int32_t* out_faces, int32_t* out_parent) {
  int64_t nb = 0;
  for (int64_t i = 0; i < n;) {
    int64_t j = i + 1;
    while (j < n && keys[j] == keys[i]) ++j;
    if (j - i == 1) {
      const int64_t src = srcs[i];
      const int64_t t = src / 4, f = src % 4;
      const int32_t* nd = tets + 4 * t;
      out_faces[3 * nb + 0] = nd[TET_FACES[f][0]];
      out_faces[3 * nb + 1] = nd[TET_FACES[f][1]];
      out_faces[3 * nb + 2] = nd[TET_FACES[f][2]];
      out_parent[nb] = (int32_t)t;
      ++nb;
    }
    i = j;
  }
  return nb;
}

int64_t extract_boundary(const int32_t* tets, int64_t m,
                         int32_t* out_faces, int32_t* out_parent) {
  const int64_t n = 4 * m;
  // max node id
  int32_t maxid = 0;
  for (int64_t i = 0; i < n; ++i)
    if (tets[i] > maxid) maxid = tets[i];

  if (maxid < (1 << 21)) {
    std::vector<uint64_t> keys(n), keys2(n);
    std::vector<int64_t> srcs(n), srcs2(n);
    for (int64_t t = 0; t < m; ++t) {
      const int32_t* nd = tets + 4 * t;
      for (int f = 0; f < 4; ++f) {
        uint64_t v0 = (uint64_t)nd[TET_FACES[f][0]];
        uint64_t v1 = (uint64_t)nd[TET_FACES[f][1]];
        uint64_t v2 = (uint64_t)nd[TET_FACES[f][2]];
        if (v0 > v1) std::swap(v0, v1);
        if (v1 > v2) std::swap(v1, v2);
        if (v0 > v1) std::swap(v0, v1);
        keys[4 * t + f] = (v0 << 42) | (v1 << 21) | v2;
        srcs[4 * t + f] = 4 * t + f;
      }
    }
    // LSD radix, 11-bit digits, 6 passes (63-bit keys)
    uint64_t* k = keys.data();
    uint64_t* k2 = keys2.data();
    int64_t* s = srcs.data();
    int64_t* s2 = srcs2.data();
    int64_t hist[2048];
    for (int pass = 0; pass < 6; ++pass) {
      const int shift = 11 * pass;
      for (int64_t b = 0; b < 2048; ++b) hist[b] = 0;
      for (int64_t i = 0; i < n; ++i) hist[(k[i] >> shift) & 2047]++;
      int64_t acc = 0;
      for (int64_t b = 0; b < 2048; ++b) {
        int64_t c = hist[b];
        hist[b] = acc;
        acc += c;
      }
      for (int64_t i = 0; i < n; ++i) {
        const int64_t pos = hist[(k[i] >> shift) & 2047]++;
        k2[pos] = k[i];
        s2[pos] = s[i];
      }
      std::swap(k, k2);
      std::swap(s, s2);
    }
    return emit_singletons(tets, n, k, s, out_faces, out_parent);
  }

  std::vector<FaceKey> keys(n);
  for (int64_t t = 0; t < m; ++t) {
    const int32_t* nd = tets + 4 * t;
    for (int f = 0; f < 4; ++f) {
      int32_t v0 = nd[TET_FACES[f][0]];
      int32_t v1 = nd[TET_FACES[f][1]];
      int32_t v2 = nd[TET_FACES[f][2]];
      if (v0 > v1) std::swap(v0, v1);
      if (v1 > v2) std::swap(v1, v2);
      if (v0 > v1) std::swap(v0, v1);
      keys[4 * t + f] = {v0, v1, v2, 4 * t + f};
    }
  }
  std::sort(keys.begin(), keys.end(),
            [](const FaceKey& x, const FaceKey& y) {
              if (x.a != y.a) return x.a < y.a;
              if (x.b != y.b) return x.b < y.b;
              return x.c < y.c;
            });
  int64_t nb = 0;
  for (int64_t i = 0; i < n;) {
    int64_t j = i + 1;
    while (j < n && keys[j].a == keys[i].a && keys[j].b == keys[i].b &&
           keys[j].c == keys[i].c)
      ++j;
    if (j - i == 1) {  // singleton -> boundary face, original orientation
      const int64_t src = keys[i].src;
      const int64_t t = src / 4, f = src % 4;
      const int32_t* nd = tets + 4 * t;
      out_faces[3 * nb + 0] = nd[TET_FACES[f][0]];
      out_faces[3 * nb + 1] = nd[TET_FACES[f][1]];
      out_faces[3 * nb + 2] = nd[TET_FACES[f][2]];
      out_parent[nb] = (int32_t)t;
      ++nb;
    }
    i = j;
  }
  return nb;
}

// Scatter per-element 4x4 stiffness blocks into per-body 27-stencil
// coefficient stacks.
//   gidx : (m,4) int64 flat lattice index of each element node
//   ke   : (m,16) double element stiffness (row-major 4x4, sans sigma)
//   body0: (m,)  int32 0-based body id
//   out  : (nbodies*27*G) double, zero-initialized by caller
// Lattice layout: lin = (i*Y + j)*Z + k  (x-major).
void accumulate_stencil(const int64_t* gidx, const double* ke,
                        const int32_t* body0, int64_t m, int64_t G,
                        int64_t Y, int64_t Z, int32_t nbodies,
                        double* out) {
  (void)nbodies;
  const int64_t YZ = Y * Z;
  for (int64_t e = 0; e < m; ++e) {
    const int64_t* g = gidx + 4 * e;
    const double* k = ke + 16 * e;
    const int64_t base_body = (int64_t)body0[e] * 27 * G;
    int ix[4], iy[4], iz[4];
    for (int a = 0; a < 4; ++a) {
      ix[a] = (int)(g[a] / YZ);
      iy[a] = (int)((g[a] / Z) % Y);
      iz[a] = (int)(g[a] % Z);
    }
    for (int a = 0; a < 4; ++a) {
      const int64_t base = base_body + g[a];
      for (int b = 0; b < 4; ++b) {
        const int off = (ix[b] - ix[a] + 1) * 9 + (iy[b] - iy[a] + 1) * 3 +
                        (iz[b] - iz[a] + 1);
        out[base + (int64_t)off * G] += k[4 * a + b];
      }
    }
  }
}

// Same scatter as accumulate_stencil, but computes the element stiffness
// on the fly from shape-function gradients:  k_ab = vol * (g_a . g_b).
// Avoids materializing the (m,16) ke array on the Python side (~230 MB at
// 1.8M tets) and the numpy einsum that builds it.
//   grads: (m,4,3) double, vol: (m,) double.
void accumulate_stencil_grads(const int64_t* gidx, const double* grads,
                              const double* vol, const int32_t* body0,
                              int64_t m, int64_t G, int64_t Y, int64_t Z,
                              int32_t nbodies, double* out) {
  (void)nbodies;
  const int64_t YZ = Y * Z;
  for (int64_t e = 0; e < m; ++e) {
    const int64_t* g = gidx + 4 * e;
    const double* gr = grads + 12 * e;
    const double v = vol[e];
    const int64_t base_body = (int64_t)body0[e] * 27 * G;
    int ix[4], iy[4], iz[4];
    for (int a = 0; a < 4; ++a) {
      ix[a] = (int)(g[a] / YZ);
      iy[a] = (int)((g[a] / Z) % Y);
      iz[a] = (int)(g[a] % Z);
    }
    for (int a = 0; a < 4; ++a) {
      const int64_t base = base_body + g[a];
      const double* ga = gr + 3 * a;
      for (int b = 0; b < 4; ++b) {
        const double* gb = gr + 3 * b;
        const double kab =
            v * (ga[0] * gb[0] + ga[1] * gb[1] + ga[2] * gb[2]);
        const int off = (ix[b] - ix[a] + 1) * 9 + (iy[b] - iy[a] + 1) * 3 +
                        (iz[b] - iz[a] + 1);
        out[base + (int64_t)off * G] += kab;
      }
    }
  }
}

// Fill the Kuhn tet connectivity of an (nx, ny, nz)-cell lattice.
//   kuhn: (6, 4, 3) int64 corner offsets; tets out: (nx*ny*nz*6, 4) i32.
// Ordering matches mesh/generate.py lattice_tets: tet r = cell r/6
// (x-major), class r%6.
void lattice_tets_fill(int64_t nx, int64_t ny, int64_t nz,
                       const int64_t* kuhn, int32_t* tets) {
  const int64_t sy = nz + 1;
  const int64_t sx = (ny + 1) * (nz + 1);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < nx; ++i) {
    for (int64_t j = 0; j < ny; ++j) {
      for (int64_t k = 0; k < nz; ++k) {
        const int64_t base = i * sx + j * sy + k;
        int32_t* out = tets + (((i * ny + j) * nz + k) * 6) * 4;
        for (int t = 0; t < 6; ++t) {
          const int64_t* kv = kuhn + 12 * t;
          for (int v = 0; v < 4; ++v) {
            out[4 * t + v] = (int32_t)(base + kv[3 * v] * sx +
                                       kv[3 * v + 1] * sy + kv[3 * v + 2]);
          }
        }
      }
    }
  }
}

// Stable counting-sort permutation of node ids (the scatter plan's
// argsort): perm such that ids[perm] is ascending, equal keys keep
// input order.  ids: (m,) i32 in [0, n); perm out: (m,) i32.
void counting_sort_perm(const int32_t* ids, int64_t m, int64_t n,
                        int64_t* counts /* scratch, (n+1) zeroed */,
                        int32_t* perm) {
  for (int64_t i = 0; i < m; ++i) counts[ids[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) counts[v + 1] += counts[v];
  for (int64_t i = 0; i < m; ++i) perm[counts[ids[i]]++] = (int32_t)i;
}

// P1 element geometry: shape-function gradients + signed volumes.
//   nodes: (n,3) double, tets: (m,4) int32.
//   grads: (m,4,3) double out;  vol: (m,) double out (signed).
// Same closed-form adjugate as ops/assembly.py element_gradients; in
// C++ because the numpy version costs ~3 s at 1.8M tets on one host
// core (the dominant term of the megatet assemble budget).
void tet_geometry(const double* nodes, const int32_t* tets, int64_t m,
                  double* grads, double* vol) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t t = 0; t < m; ++t) {
    const int32_t* nd = tets + 4 * t;
    const double* x0 = nodes + 3 * (int64_t)nd[0];
    const double* x1 = nodes + 3 * (int64_t)nd[1];
    const double* x2 = nodes + 3 * (int64_t)nd[2];
    const double* x3 = nodes + 3 * (int64_t)nd[3];
    double e1[3], e2[3], e3[3];
    for (int d = 0; d < 3; ++d) {
      e1[d] = x1[d] - x0[d];
      e2[d] = x2[d] - x0[d];
      e3[d] = x3[d] - x0[d];
    }
    const double c23[3] = {e2[1] * e3[2] - e2[2] * e3[1],
                           e2[2] * e3[0] - e2[0] * e3[2],
                           e2[0] * e3[1] - e2[1] * e3[0]};
    const double c31[3] = {e3[1] * e1[2] - e3[2] * e1[1],
                           e3[2] * e1[0] - e3[0] * e1[2],
                           e3[0] * e1[1] - e3[1] * e1[0]};
    const double c12[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                           e1[2] * e2[0] - e1[0] * e2[2],
                           e1[0] * e2[1] - e1[1] * e2[0]};
    const double det =
        e1[0] * c23[0] + e1[1] * c23[1] + e1[2] * c23[2];
    vol[t] = det / 6.0;
    const double inv = 1.0 / det;
    double* g = grads + 12 * t;
    for (int d = 0; d < 3; ++d) {
      const double g1 = c23[d] * inv;
      const double g2 = c31[d] * inv;
      const double g3 = c12[d] * inv;
      g[0 + d] = -(g1 + g2 + g3);
      g[3 + d] = g1;
      g[6 + d] = g2;
      g[9 + d] = g3;
    }
  }
}

// Signed volumes only (with_positive_volumes orientation pass).
void tet_signed_volumes(const double* nodes, const int32_t* tets,
                        int64_t m, double* vol) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t t = 0; t < m; ++t) {
    const int32_t* nd = tets + 4 * t;
    const double* x0 = nodes + 3 * (int64_t)nd[0];
    const double* x1 = nodes + 3 * (int64_t)nd[1];
    const double* x2 = nodes + 3 * (int64_t)nd[2];
    const double* x3 = nodes + 3 * (int64_t)nd[3];
    double e1[3], e2[3], e3[3];
    for (int d = 0; d < 3; ++d) {
      e1[d] = x1[d] - x0[d];
      e2[d] = x2[d] - x0[d];
      e3[d] = x3[d] - x0[d];
    }
    vol[t] = (e1[0] * (e2[1] * e3[2] - e2[2] * e3[1]) +
              e1[1] * (e2[2] * e3[0] - e2[0] * e3[2]) +
              e1[2] * (e2[0] * e3[1] - e2[1] * e3[0])) / 6.0;
  }
}

// Parse mesh.nodes text ("id partition x y z" per line).  Returns count;
// coords: caller-allocated (max_nodes,3); ids: (max_nodes,).
int64_t parse_elmer_nodes(const char* text, int64_t len, int64_t max_nodes,
                          int64_t* ids, double* coords) {
  int64_t n = 0;
  const char* p = text;
  const char* end = text + len;
  while (p < end && n < max_nodes) {
    char* next;
    long id = strtol(p, &next, 10);
    if (next == p) {  // skip to next line
      while (p < end && *p != '\n') ++p;
      ++p;
      continue;
    }
    p = next;
    strtol(p, &next, 10);  // partition (ignored)
    p = next;
    double x = strtod(p, &next); p = next;
    double y = strtod(p, &next); p = next;
    double z = strtod(p, &next); p = next;
    ids[n] = id;
    coords[3 * n] = x; coords[3 * n + 1] = y; coords[3 * n + 2] = z;
    ++n;
    while (p < end && *p != '\n') ++p;
    ++p;
  }
  return n;
}

// Parse mesh.elements ("id body 504 n1..n4").  Returns count of tet4.
int64_t parse_elmer_elements(const char* text, int64_t len,
                             int64_t max_elems, int32_t* bodies,
                             int64_t* nodes4) {
  int64_t n = 0;
  const char* p = text;
  const char* end = text + len;
  while (p < end && n < max_elems) {
    char* next;
    strtol(p, &next, 10);               // id
    if (next == p) { while (p < end && *p != '\n') ++p; ++p; continue; }
    p = next;
    long body = strtol(p, &next, 10); p = next;
    long etype = strtol(p, &next, 10); p = next;
    if (etype == 504) {
      bodies[n] = (int32_t)body;
      for (int k = 0; k < 4; ++k) {
        nodes4[4 * n + k] = strtol(p, &next, 10);
        p = next;
      }
      ++n;
    }
    while (p < end && *p != '\n') ++p;
    ++p;
  }
  return n;
}

// Apply a 27-point stencil: y = sum_o C[o] * shift(x, offset_o).
// x, y: (X*Y*Z); C: (27, X*Y*Z).  Offset order matches
// ops/stencil.py OFFSETS: o = (dx+1)*9 + (dy+1)*3 + (dz+1).
// Used by the multigrid Galerkin probing (one-time host setup) where
// the numpy version dominated hierarchy build time.
void stencil_apply(const double* x, const double* C, int64_t X,
                   int64_t Y, int64_t Z, double* y) {
  const int64_t YZ = Y * Z;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < X; ++i) {
    for (int64_t j = 0; j < Y; ++j) {
      for (int64_t k = 0; k < Z; ++k) {
        const int64_t idx = i * YZ + j * Z + k;
        double acc = 0.0;
        for (int dx = -1; dx <= 1; ++dx) {
          const int64_t ii = i + dx;
          if (ii < 0 || ii >= X) continue;
          for (int dy = -1; dy <= 1; ++dy) {
            const int64_t jj = j + dy;
            if (jj < 0 || jj >= Y) continue;
            for (int dz = -1; dz <= 1; ++dz) {
              const int64_t kk = k + dz;
              if (kk < 0 || kk >= Z) continue;
              const int o = (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1);
              acc += C[(int64_t)o * X * YZ + idx] *
                     x[ii * YZ + jj * Z + kk];
            }
          }
        }
        y[idx] = acc;
      }
    }
  }
}

// Free-dof stiffness CSR assembly (the AMG setup hot phase: the
// scipy coo->csr + fancy-index slicing path measured 9.5 s of a 12 s
// build at 870k tets — dev/amg_setup_breakdown.py).  One counting pass
// over the 16 entries per element, a per-row sort, and in-place
// duplicate merge.
//
// tets: (m,4) int32; ke: (m,16) f64 row-major (a-major: entry 4a+b);
// fmap: (n_nodes,) int32 node -> free-dof index or -1 (Dirichlet).
// indptr: caller-allocated (nf+1) int64.
// indices/data: caller-allocated worst-case (16m) int32/f64.
// Returns nnz after duplicate merge; rows are sorted ascending.
static int64_t assemble_csr_core(const int32_t* tets, const double* ke,
                                 const double* grads,
                                 const double* sigvol,
                                 const int32_t* fmap, int64_t m,
                                 int64_t nf, int64_t* indptr,
                                 int32_t* indices, double* data) {
  // pass 1: per-row raw entry counts
  std::vector<int64_t> cnt(nf + 1, 0);
  for (int64_t e = 0; e < m; ++e) {
    const int32_t* nd = tets + 4 * e;
    for (int a = 0; a < 4; ++a) {
      const int32_t r = fmap[nd[a]];
      if (r < 0) continue;
      for (int b = 0; b < 4; ++b)
        if (fmap[nd[b]] >= 0) ++cnt[r + 1];
    }
  }
  for (int64_t r = 0; r < nf; ++r) cnt[r + 1] += cnt[r];
  std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
  // pass 2: scatter raw entries (ke given, or k_ab = sigvol g_a.g_b
  // computed inline from grads)
  for (int64_t e = 0; e < m; ++e) {
    const int32_t* nd = tets + 4 * e;
    double kbuf[16];
    const double* k;
    if (ke) {
      k = ke + 16 * e;
    } else {
      const double* g = grads + 12 * e;
      const double sv = sigvol[e];
      for (int a = 0; a < 4; ++a)
        for (int b = a; b < 4; ++b) {
          const double v = sv * (g[3 * a] * g[3 * b] +
                                 g[3 * a + 1] * g[3 * b + 1] +
                                 g[3 * a + 2] * g[3 * b + 2]);
          kbuf[4 * a + b] = v;
          kbuf[4 * b + a] = v;
        }
      k = kbuf;
    }
    int32_t f[4];
    for (int a = 0; a < 4; ++a) f[a] = fmap[nd[a]];
    for (int a = 0; a < 4; ++a) {
      const int32_t r = f[a];
      if (r < 0) continue;
      for (int b = 0; b < 4; ++b) {
        if (f[b] < 0) continue;
        const int64_t p = cursor[r]++;
        indices[p] = f[b];
        data[p] = k[4 * a + b];
      }
    }
  }
  // pass 3: per-row sort + merge duplicates, compacting in place
  std::vector<std::pair<int32_t, double>> row;
  int64_t w = 0;
  indptr[0] = 0;
  for (int64_t r = 0; r < nf; ++r) {
    const int64_t lo = cnt[r];       // raw row extent (w <= lo always,
    const int64_t hi = cnt[r + 1];   // so compaction never overruns)
    row.clear();
    for (int64_t p = lo; p < hi; ++p) row.push_back({indices[p], data[p]});
    std::sort(row.begin(), row.end(),
              [](const std::pair<int32_t, double>& x,
                 const std::pair<int32_t, double>& y) {
                return x.first < y.first;
              });
    for (size_t i = 0; i < row.size();) {
      double s = row[i].second;
      size_t j = i + 1;
      while (j < row.size() && row[j].first == row[i].first)
        s += row[j++].second;
      indices[w] = row[i].first;
      data[w] = s;
      ++w;
      i = j;
    }
    indptr[r + 1] = w;
  }
  return w;
}

int64_t assemble_csr_free(const int32_t* tets, const double* ke,
                          const int32_t* fmap, int64_t m, int64_t nf,
                          int64_t* indptr, int32_t* indices,
                          double* data) {
  return assemble_csr_core(tets, ke, nullptr, nullptr, fmap, m, nf,
                           indptr, indices, data);
}

// Variant computing k_ab = sigvol * (g_a . g_b) inline from grads
// (m,4,3) + sigvol (m,) — skips materializing the (m,16) Ke array.
int64_t assemble_csr_free_grads(const int32_t* tets, const double* grads,
                                const double* sigvol,
                                const int32_t* fmap, int64_t m,
                                int64_t nf, int64_t* indptr,
                                int32_t* indices, double* data) {
  return assemble_csr_core(tets, nullptr, grads, sigvol, fmap, m, nf,
                           indptr, indices, data);
}

}  // extern "C"
