// Native isosurface extraction: marching tetrahedra over a dense scalar
// grid, mirroring the vectorised numpy implementation in core/mesh.py
// (same 6-tet cube decomposition, same case tables, same edge-keyed vertex
// dedup), but single-pass and allocation-light — the numpy path materialises
// several N^3 temporaries, which hurts at the reference's final N=512 mesh
// (134M voxels, siren/train_sdf.py:101).
//
// Build: g++ -O3 -shared -fPIC -o libmesh_kernels.so mesh_kernels.cpp
// Interface: C ABI consumed via ctypes from core/mesh.py.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Cube corners (x, y, z) offsets — keep identical to core/mesh.py _CUBE.
const int CUBE[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// 6-tetrahedra decomposition along the 0-6 diagonal (== _TETS).
const int TETS[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

// Tet edges by local vertex pair (== _TET_EDGES).
const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

// Per-case triangles as tet-edge triples, -1 padded (== _TET_TRIS).
const int TRI_TABLE[16][2][3] = {
    /*0000*/ {{-1, -1, -1}, {-1, -1, -1}},
    /*0001*/ {{0, 1, 2}, {-1, -1, -1}},
    /*0010*/ {{0, 4, 3}, {-1, -1, -1}},
    /*0011*/ {{1, 2, 4}, {1, 4, 3}},
    /*0100*/ {{1, 3, 5}, {-1, -1, -1}},
    /*0101*/ {{0, 3, 5}, {0, 5, 2}},
    /*0110*/ {{0, 5, 1}, {0, 4, 5}},
    /*0111*/ {{2, 4, 5}, {-1, -1, -1}},
    /*1000*/ {{2, 5, 4}, {-1, -1, -1}},
    /*1001*/ {{0, 1, 5}, {0, 5, 4}},
    /*1010*/ {{0, 5, 3}, {0, 2, 5}},
    /*1011*/ {{1, 5, 3}, {-1, -1, -1}},
    /*1100*/ {{1, 4, 2}, {1, 3, 4}},
    /*1101*/ {{0, 3, 4}, {-1, -1, -1}},
    /*1110*/ {{0, 2, 1}, {-1, -1, -1}},
    /*1111*/ {{-1, -1, -1}, {-1, -1, -1}},
};

struct Extractor {
  const float* v;
  int64_t nx, ny, nz;
  float level;
  std::unordered_map<uint64_t, int32_t> edge_to_vertex;
  std::vector<float> verts;   // interpolated, in GRID units
  std::vector<int32_t> faces;

  inline float val(int64_t id) const { return v[id]; }

  int32_t vertex_for_edge(int64_t ga, int64_t gb) {
    int64_t lo = ga < gb ? ga : gb;
    int64_t hi = ga < gb ? gb : ga;
    uint64_t key =
        (static_cast<uint64_t>(lo) * static_cast<uint64_t>(nx * ny * nz))
        + static_cast<uint64_t>(hi);
    auto it = edge_to_vertex.find(key);
    if (it != edge_to_vertex.end()) return it->second;

    float va = val(ga), vb = val(gb);
    float denom = vb - va;
    float t = (denom < 1e-12f && denom > -1e-12f)
                  ? 0.5f
                  : (level - va) / denom;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    float ax = static_cast<float>(ga / (ny * nz));
    float ay = static_cast<float>((ga / nz) % ny);
    float az = static_cast<float>(ga % nz);
    float bx = static_cast<float>(gb / (ny * nz));
    float by = static_cast<float>((gb / nz) % ny);
    float bz = static_cast<float>(gb % nz);
    int32_t idx = static_cast<int32_t>(verts.size() / 3);
    verts.push_back(ax + t * (bx - ax));
    verts.push_back(ay + t * (by - ay));
    verts.push_back(az + t * (bz - az));
    edge_to_vertex.emplace(key, idx);
    return idx;
  }

  void run() {
    for (int64_t x = 0; x < nx - 1; ++x) {
      for (int64_t y = 0; y < ny - 1; ++y) {
        for (int64_t z = 0; z < nz - 1; ++z) {
          // corner values + global ids
          float cv[8];
          int64_t cid[8];
          int inside = 0;
          for (int c = 0; c < 8; ++c) {
            int64_t id = (x + CUBE[c][0]) * ny * nz
                         + (y + CUBE[c][1]) * nz + (z + CUBE[c][2]);
            cid[c] = id;
            cv[c] = v[id];
            inside += (cv[c] < level);
          }
          if (inside == 0 || inside == 8) continue;

          for (int t = 0; t < 6; ++t) {
            int caseno = 0;
            for (int k = 0; k < 4; ++k)
              caseno |= (cv[TETS[t][k]] < level) << k;
            for (int tri = 0; tri < 2; ++tri) {
              const int* e = TRI_TABLE[caseno][tri];
              if (e[0] < 0) break;
              int32_t ids[3];
              for (int k = 0; k < 3; ++k) {
                int ea = TETS[t][TET_EDGES[e[k]][0]];
                int eb = TETS[t][TET_EDGES[e[k]][1]];
                ids[k] = vertex_for_edge(cid[ea], cid[eb]);
              }
              if (ids[0] != ids[1] && ids[1] != ids[2] && ids[0] != ids[2]) {
                faces.push_back(ids[0]);
                faces.push_back(ids[1]);
                faces.push_back(ids[2]);
              }
            }
          }
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// Returns 0 on success.  Caller frees *verts_out / *faces_out with mt_free.
int mt_extract(const float* values, int64_t nx, int64_t ny, int64_t nz,
               float level, float ox, float oy, float oz, float sx, float sy,
               float sz, float** verts_out, int32_t** faces_out,
               int64_t* n_verts, int64_t* n_faces) {
  Extractor ex;
  ex.v = values;
  ex.nx = nx;
  ex.ny = ny;
  ex.nz = nz;
  ex.level = level;
  ex.run();

  int64_t nv = static_cast<int64_t>(ex.verts.size() / 3);
  int64_t nf = static_cast<int64_t>(ex.faces.size() / 3);
  float* vb = static_cast<float*>(std::malloc(sizeof(float) * 3 * nv));
  int32_t* fb =
      static_cast<int32_t*>(std::malloc(sizeof(int32_t) * 3 * nf));
  if ((nv && !vb) || (nf && !fb)) {
    std::free(vb);
    std::free(fb);
    return 1;
  }
  for (int64_t i = 0; i < nv; ++i) {
    vb[3 * i + 0] = ex.verts[3 * i + 0] * sx + ox;
    vb[3 * i + 1] = ex.verts[3 * i + 1] * sy + oy;
    vb[3 * i + 2] = ex.verts[3 * i + 2] * sz + oz;
  }
  if (nf) std::memcpy(fb, ex.faces.data(), sizeof(int32_t) * 3 * nf);
  *verts_out = vb;
  *faces_out = fb;
  *n_verts = nv;
  *n_faces = nf;
  return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
