// gsplat_tpu native IO core.
//
// TPU-native counterpart of the reference's C++ data plumbing: the reference
// parses COLMAP models in pure python (scene/colmap_loader.py) and reads PLYs
// via plyfile; for production-scale scenes (millions of points, thousands of
// images) those dominate startup. This library provides zero-copy bulk
// parsers exposed through a C ABI consumed via ctypes
// (gsplat_tpu/data/native.py), with the pure-python implementations as
// fallback when the library isn't built.
//
// Build: make -C native   (produces libgsplat_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace {

struct FileBuf {
    std::vector<char> data;
    bool ok = false;
};

FileBuf read_file(const char* path) {
    FileBuf out;
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f) return out;
    std::streamsize n = f.tellg();
    f.seekg(0);
    out.data.resize(static_cast<size_t>(n));
    if (!f.read(out.data.data(), n)) return out;
    out.ok = true;
    return out;
}

template <typename T>
T rd(const char*& p) {
    T v;
    std::memcpy(&v, p, sizeof(T));
    p += sizeof(T);
    return v;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// COLMAP points3D.bin  (layout: u64 count; per point: i64 id, 3xf64 xyz,
// 3xu8 rgb, f64 error, u64 track_len, track_len x (i32,i32))
// ---------------------------------------------------------------------------

// First call with xyz == nullptr returns the point count (or -1 on error);
// second call fills xyz [n*3] f32, rgb [n*3] u8, err [n] f32.
int64_t colmap_points3d_read(const char* path, float* xyz, uint8_t* rgb,
                             float* err) {
    FileBuf fb = read_file(path);
    if (!fb.ok || fb.data.size() < 8) return -1;
    const char* p = fb.data.data();
    const char* end = p + fb.data.size();
    uint64_t n = rd<uint64_t>(p);
    if (xyz == nullptr) return static_cast<int64_t>(n);
    for (uint64_t i = 0; i < n; i++) {
        if (p + 8 + 24 + 3 + 8 + 8 > end) return -2;
        p += 8;  // id
        for (int k = 0; k < 3; k++) xyz[i * 3 + k] = static_cast<float>(rd<double>(p));
        for (int k = 0; k < 3; k++) rgb[i * 3 + k] = static_cast<uint8_t>(rd<uint8_t>(p));
        err[i] = static_cast<float>(rd<double>(p));
        uint64_t tlen = rd<uint64_t>(p);
        p += 8 * tlen;  // skip track
        if (p > end) return -2;
    }
    return static_cast<int64_t>(n);
}

// ---------------------------------------------------------------------------
// COLMAP images.bin (u64 count; per image: i32 id, 4xf64 qvec, 3xf64 tvec,
// i32 camera_id, name\0, u64 npts, npts x (f64,f64,i64))
// ---------------------------------------------------------------------------

// Pass 1 (ids == nullptr): returns image count and fills *names_bytes with
// the total size of the concatenated \0-separated name buffer.
// Pass 2: fills ids [n], qvec [n*4] f64, tvec [n*3] f64, camera_ids [n],
// names (concatenated, \0 separated).
int64_t colmap_images_read(const char* path, int32_t* ids, double* qvec,
                           double* tvec, int32_t* camera_ids, char* names,
                           int64_t* names_bytes) {
    FileBuf fb = read_file(path);
    if (!fb.ok || fb.data.size() < 8) return -1;
    const char* p = fb.data.data();
    const char* end = p + fb.data.size();
    uint64_t n = rd<uint64_t>(p);
    int64_t total_names = 0;
    char* nm = names;
    for (uint64_t i = 0; i < n; i++) {
        if (p + 4 + 56 + 4 > end) return -2;
        int32_t id = rd<int32_t>(p);
        double q[4], t[3];
        for (auto& v : q) v = rd<double>(p);
        for (auto& v : t) v = rd<double>(p);
        int32_t cam = rd<int32_t>(p);
        const char* name_start = p;
        while (p < end && *p != '\0') p++;
        if (p >= end) return -2;
        int64_t name_len = p - name_start + 1;  // incl. \0
        p++;
        total_names += name_len;
        if (ids != nullptr) {
            ids[i] = id;
            std::memcpy(qvec + i * 4, q, sizeof(q));
            std::memcpy(tvec + i * 3, t, sizeof(t));
            camera_ids[i] = cam;
            std::memcpy(nm, name_start, static_cast<size_t>(name_len));
            nm += name_len;
        }
        if (p + 8 > end) return -2;
        uint64_t npts = rd<uint64_t>(p);
        p += 24 * npts;
        if (p > end) return -2;
    }
    if (names_bytes) *names_bytes = total_names;
    return static_cast<int64_t>(n);
}

// ---------------------------------------------------------------------------
// PLY vertex reader: binary_little_endian float32/float64/uchar properties.
// Reads `n_props` properties by name into out [n_verts, n_props] float32.
// prop_names: \0-separated list. Returns vertex count, or <0 on error.
// Call with out == nullptr to query the vertex count.
// ---------------------------------------------------------------------------
int64_t ply_vertex_read(const char* path, const char* prop_names,
                        int32_t n_props, float* out) {
    FileBuf fb = read_file(path);
    if (!fb.ok) return -1;
    const std::string data(fb.data.data(), fb.data.size());
    size_t hdr_end = data.find("end_header\n");
    if (hdr_end == std::string::npos) return -1;
    std::string header = data.substr(0, hdr_end);
    const char* body = fb.data.data() + hdr_end + 11;
    const char* end = fb.data.data() + fb.data.size();

    if (header.find("binary_little_endian") == std::string::npos) return -3;

    // parse vertex element property list
    struct Prop { std::string name; int size; char kind; };
    std::vector<Prop> props;
    int64_t n_verts = -1;
    bool in_vertex = false;
    size_t pos = 0;
    while (pos < header.size()) {
        size_t eol = header.find('\n', pos);
        if (eol == std::string::npos) eol = header.size();
        std::string line = header.substr(pos, eol - pos);
        pos = eol + 1;
        if (line.rfind("element ", 0) == 0) {
            in_vertex = line.rfind("element vertex ", 0) == 0;
            if (in_vertex) n_verts = std::stoll(line.substr(15));
        } else if (in_vertex && line.rfind("property ", 0) == 0) {
            size_t sp1 = line.find(' ', 9);
            std::string type = line.substr(9, sp1 - 9);
            std::string name = line.substr(sp1 + 1);
            Prop pr{name, 4, 'f'};
            if (type == "float" || type == "float32") { pr.size = 4; pr.kind = 'f'; }
            else if (type == "double" || type == "float64") { pr.size = 8; pr.kind = 'd'; }
            else if (type == "uchar" || type == "uint8") { pr.size = 1; pr.kind = 'b'; }
            else if (type == "int" || type == "int32") { pr.size = 4; pr.kind = 'i'; }
            else if (type == "uint" || type == "uint32") { pr.size = 4; pr.kind = 'u'; }
            else if (type == "short" || type == "int16") { pr.size = 2; pr.kind = 's'; }
            else if (type == "ushort" || type == "uint16") { pr.size = 2; pr.kind = 'S'; }
            else return -4;  // list/unsupported
            props.push_back(pr);
        }
    }
    if (n_verts < 0) return -1;
    if (out == nullptr) return n_verts;

    // requested property -> (offset, kind)
    size_t stride = 0;
    std::vector<size_t> offsets(props.size());
    for (size_t i = 0; i < props.size(); i++) {
        offsets[i] = stride;
        stride += props[i].size;
    }
    std::vector<int> sel(n_props, -1);
    {
        const char* q = prop_names;
        for (int32_t j = 0; j < n_props; j++) {
            std::string want(q);
            q += want.size() + 1;
            for (size_t i = 0; i < props.size(); i++)
                if (props[i].name == want) { sel[j] = static_cast<int>(i); break; }
            if (sel[j] < 0) return -5;
        }
    }
    if (body + stride * n_verts > end) return -2;

    for (int64_t v = 0; v < n_verts; v++) {
        const char* row = body + v * stride;
        for (int32_t j = 0; j < n_props; j++) {
            const Prop& pr = props[static_cast<size_t>(sel[j])];
            const char* src = row + offsets[static_cast<size_t>(sel[j])];
            float val;
            switch (pr.kind) {
                case 'f': { float x; std::memcpy(&x, src, 4); val = x; break; }
                case 'd': { double x; std::memcpy(&x, src, 8); val = static_cast<float>(x); break; }
                case 'b': { val = static_cast<float>(*reinterpret_cast<const uint8_t*>(src)); break; }
                case 'i': { int32_t x; std::memcpy(&x, src, 4); val = static_cast<float>(x); break; }
                case 'u': { uint32_t x; std::memcpy(&x, src, 4); val = static_cast<float>(x); break; }
                case 's': { int16_t x; std::memcpy(&x, src, 2); val = static_cast<float>(x); break; }
                default:  { uint16_t x; std::memcpy(&x, src, 2); val = static_cast<float>(x); break; }
            }
            out[v * n_props + j] = val;
        }
    }
    return n_verts;
}

// PLY writer: binary_little_endian, n_props float32 properties per vertex.
int64_t ply_vertex_write(const char* path, const char* prop_names,
                         int32_t n_props, const float* data, int64_t n_verts) {
    std::ofstream f(path, std::ios::binary);
    if (!f) return -1;
    f << "ply\nformat binary_little_endian 1.0\ncomment gsplat_tpu native\n";
    f << "element vertex " << n_verts << "\n";
    const char* q = prop_names;
    for (int32_t j = 0; j < n_props; j++) {
        std::string name(q);
        q += name.size() + 1;
        f << "property float " << name << "\n";
    }
    f << "end_header\n";
    f.write(reinterpret_cast<const char*>(data),
            static_cast<std::streamsize>(sizeof(float) * n_props * n_verts));
    return f ? n_verts : -2;
}

}  // extern "C"
