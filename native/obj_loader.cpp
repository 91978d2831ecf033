// Native OBJ text parser: the hot host loop of mesh loading
// (semantics of reference mesh_loading.cuh:221-317, re-derived; the Python
// loader in scene/obj.py is the oracle). Parses v/vn/vt/usemtl/f with fan
// triangulation, negative indices, vt v-flip, false-normal face skipping,
// and returns flat index arrays; material resolution / normal smoothing /
// transforms stay in the (already vectorized) Python layer.
//
// C ABI for ctypes. Build: make -C native (libobjload.so).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <set>
#include <string>
#include <vector>

namespace {

struct Parsed {
  std::vector<float> positions;   // (P*3)
  std::vector<float> normals;     // (N*3)
  std::vector<float> uvs;         // (T*2), v already flipped 1-v
  // per corner: position/uv/normal indices (-1 = absent), 3 corners/face
  std::vector<int32_t> face_pos;
  std::vector<int32_t> face_uv;
  std::vector<int32_t> face_nrm;
  std::vector<int32_t> face_mat;  // per face material id
  std::string mat_names;          // '\n'-joined material names (by id)
};

// split on spaces dropping empties (split_string, mesh_loading.cuh:73-103)
inline void tokenize(char* line, std::vector<char*>& toks) {
  toks.clear();
  for (char* p = strtok(line, " \t\r\n"); p; p = strtok(nullptr, " \t\r\n"))
    toks.push_back(p);
}

// 'p/t/n' spec -> indices; '/' fields kept including empties
// (create_vertex, mesh_loading.cuh:105-150)
inline void parse_vertex(const char* spec, int np, int nt, int nn,
                         int32_t* out) {
  out[0] = out[1] = out[2] = -1;
  const int counts[3] = {np, nt, nn};
  int field = 0;
  const char* start = spec;
  for (const char* p = spec;; ++p) {
    if (*p == '/' || *p == '\0') {
      if (p > start && field < 3) {
        int idx = atoi(std::string(start, p - start).c_str());
        out[field] = idx > 0 ? idx - 1 : counts[field] + idx;
      }
      ++field;
      if (*p == '\0' || field >= 3) break;
      start = p + 1;
    }
  }
}

}  // namespace

extern "C" {

struct ObjResult {
  float* positions;
  int64_t n_positions;
  float* normals;
  int64_t n_normals;
  float* uvs;
  int64_t n_uvs;
  int32_t* face_pos;   // (F*3)
  int32_t* face_uv;    // (F*3)
  int32_t* face_nrm;   // (F*3)
  int32_t* face_mat;   // (F)
  int64_t n_faces;
  char* mat_names;     // '\n'-joined, face_mat indexes split order
  int64_t mat_names_len;
};

ObjResult* obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  Parsed out;
  std::set<int> false_normals;
  std::vector<std::string> mats;
  int cur_mat = -1;

  auto mat_id = [&](const std::string& name) {
    for (size_t i = 0; i < mats.size(); ++i)
      if (mats[i] == name) return static_cast<int>(i);
    mats.push_back(name);
    return static_cast<int>(mats.size()) - 1;
  };

  char buf[65536];
  std::vector<char*> toks;
  std::vector<int32_t> corner(3);
  while (fgets(buf, sizeof(buf), f)) {
    tokenize(buf, toks);
    if (toks.empty()) continue;
    const char* tag = toks[0];
    if (!strcmp(tag, "v") && toks.size() >= 4) {
      out.positions.push_back(strtof(toks[1], nullptr));
      out.positions.push_back(strtof(toks[2], nullptr));
      out.positions.push_back(strtof(toks[3], nullptr));
    } else if (!strcmp(tag, "vn") && toks.size() >= 4) {
      float x = strtof(toks[1], nullptr);
      float y = strtof(toks[2], nullptr);
      float z = strtof(toks[3], nullptr);
      if (x == 0.0f && y == 0.0f && z == 0.0f)
        false_normals.insert(static_cast<int>(out.normals.size() / 3));
      out.normals.push_back(x);
      out.normals.push_back(y);
      out.normals.push_back(z);
    } else if (!strcmp(tag, "vt") && toks.size() >= 3) {
      out.uvs.push_back(strtof(toks[1], nullptr));
      out.uvs.push_back(1.0f - strtof(toks[2], nullptr));  // v-flip
    } else if (!strcmp(tag, "usemtl") && toks.size() >= 2) {
      cur_mat = mat_id(toks[1]);
    } else if (!strcmp(tag, "f") && toks.size() >= 4) {
      int np = static_cast<int>(out.positions.size() / 3);
      int nt = static_cast<int>(out.uvs.size() / 2);
      int nn = static_cast<int>(out.normals.size() / 3);
      int32_t v1[3];
      parse_vertex(toks[1], np, nt, nn, v1);
      if (false_normals.count(v1[2])) continue;  // skip whole face
      int32_t prev[3];
      parse_vertex(toks[2], np, nt, nn, prev);
      for (size_t i = 3; i < toks.size(); ++i) {
        int32_t v3[3];
        parse_vertex(toks[i], np, nt, nn, v3);
        out.face_pos.push_back(v1[0]);
        out.face_uv.push_back(v1[1]);
        out.face_nrm.push_back(v1[2]);
        out.face_pos.push_back(prev[0]);
        out.face_uv.push_back(prev[1]);
        out.face_nrm.push_back(prev[2]);
        out.face_pos.push_back(v3[0]);
        out.face_uv.push_back(v3[1]);
        out.face_nrm.push_back(v3[2]);
        out.face_mat.push_back(cur_mat);
        memcpy(prev, v3, sizeof(prev));
      }
    }
  }
  fclose(f);

  for (size_t i = 0; i < mats.size(); ++i) {
    if (i) out.mat_names += '\n';
    out.mat_names += mats[i];
  }

  ObjResult* r = new ObjResult;
  auto copy_f = [](const std::vector<float>& v) {
    float* p = static_cast<float*>(std::malloc(v.size() * 4 + 4));
    std::memcpy(p, v.data(), v.size() * 4);
    return p;
  };
  auto copy_i = [](const std::vector<int32_t>& v) {
    int32_t* p = static_cast<int32_t*>(std::malloc(v.size() * 4 + 4));
    std::memcpy(p, v.data(), v.size() * 4);
    return p;
  };
  r->positions = copy_f(out.positions);
  r->n_positions = static_cast<int64_t>(out.positions.size() / 3);
  r->normals = copy_f(out.normals);
  r->n_normals = static_cast<int64_t>(out.normals.size() / 3);
  r->uvs = copy_f(out.uvs);
  r->n_uvs = static_cast<int64_t>(out.uvs.size() / 2);
  r->face_pos = copy_i(out.face_pos);
  r->face_uv = copy_i(out.face_uv);
  r->face_nrm = copy_i(out.face_nrm);
  r->face_mat = copy_i(out.face_mat);
  r->n_faces = static_cast<int64_t>(out.face_mat.size());
  r->mat_names_len = static_cast<int64_t>(out.mat_names.size());
  r->mat_names = static_cast<char*>(std::malloc(out.mat_names.size() + 1));
  std::memcpy(r->mat_names, out.mat_names.c_str(), out.mat_names.size() + 1);
  return r;
}

void obj_free(ObjResult* r) {
  if (!r) return;
  std::free(r->positions);
  std::free(r->normals);
  std::free(r->uvs);
  std::free(r->face_pos);
  std::free(r->face_uv);
  std::free(r->face_nrm);
  std::free(r->face_mat);
  std::free(r->mat_names);
  delete r;
}

}  // extern "C"
