// Native mesh accumulator: triangle-soup -> indexed mesh with stamped vertices.
//
// C++ replacement for the host-side hot path of MeshAccumulator
// (khronos_tpu/stm/scene_graph.py): quantized vertex deduplication with
// first/last-seen stamp merging. Mirrors the role kimera_pgmo's C++ mesh
// compression plays in the reference stack (SURVEY.md §2.3,
// mesh_resolution: 0.005) — the device produces triangle batches, this keeps
// the growing global mesh index at native speed.
//
// Exposed as a C API consumed via ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int64_t x, y, z;
  bool operator==(const Key& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    // 3D spatial hash (large primes), same idea as spatial_hash's block hash
    return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349669LL ^
                               k.z * 83492791LL);
  }
};

struct Accum {
  double resolution;
  std::unordered_map<Key, int64_t, KeyHash> index;
  std::vector<float> vertices;   // 3 per vertex
  std::vector<float> colors;     // 3 per vertex
  std::vector<int32_t> labels;   // 1 per vertex
  std::vector<int64_t> first_ns; // 1 per vertex
  std::vector<int64_t> last_ns;  // 1 per vertex
  std::vector<int64_t> faces;    // 3 per face
};

}  // namespace

extern "C" {

void* mesh_accum_create(double resolution) {
  auto* a = new Accum();
  a->resolution = resolution;
  a->index.reserve(1 << 16);
  return a;
}

void mesh_accum_destroy(void* h) { delete static_cast<Accum*>(h); }

// verts: [T, 3, 3] row-major; colors same; first/last: [T, 3]; labels: [T, 3].
// Returns number of new vertices created.
int64_t mesh_accum_add(void* h, const float* verts, const float* colors,
                       const int64_t* first_ns, const int64_t* last_ns,
                       const int32_t* labels, int64_t n_tris) {
  auto* a = static_cast<Accum*>(h);
  const double inv = 1.0 / a->resolution;
  int64_t created = 0;
  int64_t ids[3];
  for (int64_t t = 0; t < n_tris; ++t) {
    for (int k = 0; k < 3; ++k) {
      const float* v = verts + (t * 3 + k) * 3;
      Key key{static_cast<int64_t>(std::llround(v[0] * inv)),
              static_cast<int64_t>(std::llround(v[1] * inv)),
              static_cast<int64_t>(std::llround(v[2] * inv))};
      auto it = a->index.find(key);
      int64_t vid;
      if (it == a->index.end()) {
        vid = static_cast<int64_t>(a->labels.size());
        a->index.emplace(key, vid);
        const float* c = colors + (t * 3 + k) * 3;
        a->vertices.insert(a->vertices.end(), v, v + 3);
        a->colors.insert(a->colors.end(), c, c + 3);
        a->labels.push_back(labels[t * 3 + k]);
        a->first_ns.push_back(first_ns[t * 3 + k]);
        a->last_ns.push_back(last_ns[t * 3 + k]);
        ++created;
      } else {
        vid = it->second;
        const int64_t f = first_ns[t * 3 + k];
        const int64_t l = last_ns[t * 3 + k];
        if (f < a->first_ns[vid]) a->first_ns[vid] = f;
        if (l > a->last_ns[vid]) a->last_ns[vid] = l;
      }
      ids[k] = vid;
    }
    if (ids[0] != ids[1] && ids[1] != ids[2] && ids[0] != ids[2]) {
      a->faces.insert(a->faces.end(), ids, ids + 3);
    }
  }
  return created;
}

int64_t mesh_accum_num_vertices(void* h) {
  return static_cast<Accum*>(h)->labels.size();
}

int64_t mesh_accum_num_faces(void* h) {
  return static_cast<Accum*>(h)->faces.size() / 3;
}

// Caller allocates output arrays of the right size (num_vertices/num_faces).
void mesh_accum_get(void* h, float* verts, float* colors, int32_t* labels,
                    int64_t* first_ns, int64_t* last_ns, int64_t* faces) {
  auto* a = static_cast<Accum*>(h);
  std::memcpy(verts, a->vertices.data(), a->vertices.size() * sizeof(float));
  std::memcpy(colors, a->colors.data(), a->colors.size() * sizeof(float));
  std::memcpy(labels, a->labels.data(), a->labels.size() * sizeof(int32_t));
  std::memcpy(first_ns, a->first_ns.data(), a->first_ns.size() * sizeof(int64_t));
  std::memcpy(last_ns, a->last_ns.data(), a->last_ns.size() * sizeof(int64_t));
  std::memcpy(faces, a->faces.data(), a->faces.size() * sizeof(int64_t));
}

}  // extern "C"
