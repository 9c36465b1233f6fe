// Native marching-tetrahedra iso-surface extraction.
//
// Fast path for attentive_dfprior_tpu/utils/marching_cubes.py (the numpy
// implementation is the golden reference; this C++ version is ~50x faster on
// the 256^3 lattices the mesher queries, ref workload:
// src/utils/Mesher.py:428-477). Identical algorithm: 6-tet cube split around
// diagonal 0-6, per-tet sign cases, vertices interpolated on edges and
// deduplicated by global edge id (via a hash map).

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

const int CORNERS[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                           {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
const int TETS[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                        {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

struct MeshAcc {
  std::vector<double> verts;   // xyz
  std::vector<int64_t> faces;  // triples
  std::unordered_map<uint64_t, int64_t> edge_to_vert;
};

}  // namespace

extern "C" {

// Returns number of triangles emitted. Call once with out_* == nullptr to get
// sizes? Instead we use an opaque two-pass-free design: results are stored in
// thread-local buffers and fetched by the companion functions below.
static thread_local MeshAcc g_acc;

void mt_run(const double* vol, int64_t X, int64_t Y, int64_t Z, double level) {
  g_acc.verts.clear();
  g_acc.faces.clear();
  g_acc.edge_to_vert.clear();
  g_acc.edge_to_vert.reserve(1 << 20);

  auto val = [&](int64_t i, int64_t j, int64_t k) {
    return vol[(i * Y + j) * Z + k];
  };
  auto gid = [&](int64_t i, int64_t j, int64_t k) {
    return (i * Y + j) * Z + k;
  };

  auto vert_on_edge = [&](int64_t ga, int64_t gb) -> int64_t {
    uint64_t key;
    int64_t lo = ga < gb ? ga : gb, hi = ga < gb ? gb : ga;
    key = ((uint64_t)lo << 32) | (uint64_t)(hi & 0xffffffff);
    // NOTE: assumes X*Y*Z < 2^32 grid points (true for <= 1024^3 ... 2^30).
    auto it = g_acc.edge_to_vert.find(key);
    if (it != g_acc.edge_to_vert.end()) return it->second;
    // unravel ids
    int64_t ia = lo / (Y * Z), ra = lo % (Y * Z), ja = ra / Z, ka = ra % Z;
    int64_t ib = hi / (Y * Z), rb = hi % (Y * Z), jb = rb / Z, kb = rb % Z;
    double va = vol[lo], vb = vol[hi];
    double denom = vb - va;
    if (std::fabs(denom) < 1e-12) denom = 1e-12;
    double t = (level - va) / denom;
    if (t < 0) t = 0;
    if (t > 1) t = 1;
    int64_t idx = (int64_t)(g_acc.verts.size() / 3);
    g_acc.verts.push_back(ia + t * (ib - ia));
    g_acc.verts.push_back(ja + t * (jb - ja));
    g_acc.verts.push_back(ka + t * (kb - ka));
    g_acc.edge_to_vert.emplace(key, idx);
    return idx;
  };

  for (int64_t i = 0; i + 1 < X; ++i) {
    for (int64_t j = 0; j + 1 < Y; ++j) {
      for (int64_t k = 0; k + 1 < Z; ++k) {
        double cv[8];
        int64_t cg[8];
        bool in[8];
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) {
          int64_t ii = i + CORNERS[c][0], jj = j + CORNERS[c][1],
                  kk = k + CORNERS[c][2];
          cv[c] = val(ii, jj, kk);
          cg[c] = gid(ii, jj, kk);
          in[c] = cv[c] > level;
          any_in |= in[c];
          any_out |= !in[c];
        }
        if (!any_in || !any_out) continue;  // no crossing in this cell

        for (int t = 0; t < 6; ++t) {
          const int* tet = TETS[t];
          int code = (in[tet[0]] ? 1 : 0) | (in[tet[1]] ? 2 : 0) |
                     (in[tet[2]] ? 4 : 0) | (in[tet[3]] ? 8 : 0);
          if (code == 0 || code == 15) continue;
          int ins[4], outs[4], ni = 0, no = 0;
          for (int v = 0; v < 4; ++v) {
            if (in[tet[v]]) ins[ni++] = tet[v];
            else outs[no++] = tet[v];
          }
          auto emit = [&](int64_t a0, int64_t b0, int64_t a1, int64_t b1,
                          int64_t a2, int64_t b2) {
            int64_t v0 = vert_on_edge(cg[a0], cg[b0]);
            int64_t v1 = vert_on_edge(cg[a1], cg[b1]);
            int64_t v2 = vert_on_edge(cg[a2], cg[b2]);
            if (v0 == v1 || v1 == v2 || v0 == v2) return;
            g_acc.faces.push_back(v0);
            g_acc.faces.push_back(v1);
            g_acc.faces.push_back(v2);
          };
          if (ni == 1) {
            emit(ins[0], outs[0], ins[0], outs[1], ins[0], outs[2]);
          } else if (ni == 3) {
            emit(ins[0], outs[0], ins[2], outs[0], ins[1], outs[0]);
          } else {  // ni == 2
            emit(ins[0], outs[0], ins[0], outs[1], ins[1], outs[1]);
            emit(ins[0], outs[0], ins[1], outs[1], ins[1], outs[0]);
          }
        }
      }
    }
  }
}

int64_t mt_num_verts() { return (int64_t)(g_acc.verts.size() / 3); }
int64_t mt_num_faces() { return (int64_t)(g_acc.faces.size() / 3); }

void mt_get(double* verts_out, int64_t* faces_out) {
  std::copy(g_acc.verts.begin(), g_acc.verts.end(), verts_out);
  std::copy(g_acc.faces.begin(), g_acc.faces.end(), faces_out);
  g_acc.verts.clear();
  g_acc.faces.clear();
  g_acc.edge_to_vert.clear();
}

}  // extern "C"
