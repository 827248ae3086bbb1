// fastio — native scene-IO accelerator (CPython C API, no pybind11).
//
// The reference stack's native layer is CUDA kernels plus C++ host
// orchestration; on the TPU rebuild the device work lives in Pallas/XLA and
// the host-side hot IO (COLMAP binary models with millions of track entries,
// multi-hundred-MB Gaussian PLY checkpoints) lives here. Python fallbacks in
// `data/colmap.py` / `data/ply.py` remain authoritative for correctness;
// this module accelerates them ~10-50× for large scenes.
//
// Exposed functions (all return plain dict/tuple/ndarray-compatible bytes):
//   read_points3d_bin(path)  -> (xyz f64 bytes, rgb u8 bytes, err f64 bytes, n)
//   read_images_bin(path)    -> list[(id, qvec(4), tvec(3), camera_id, name)]
//   read_ply_f32(path, names)-> dict name -> bytes (f32 columns)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct File {
    FILE* f = nullptr;
    explicit File(const char* path) { f = std::fopen(path, "rb"); }
    ~File() { if (f) std::fclose(f); }
    bool ok() const { return f != nullptr; }
    template <typename T>
    bool read(T* out, size_t n = 1) {
        return std::fread(out, sizeof(T), n, f) == n;
    }
    bool skip(long long n) { return std::fseek(f, n, SEEK_CUR) == 0; }
    // Total file size in bytes (restores position); -1 on failure.
    long long size() {
        long long pos = std::ftell(f);
        if (pos < 0 || std::fseek(f, 0, SEEK_END) != 0) return -1;
        long long end = std::ftell(f);
        if (std::fseek(f, pos, SEEK_SET) != 0) return -1;
        return end;
    }
};

PyObject* io_error(const char* path, const char* what) {
    PyErr_Format(PyExc_IOError, "%s: %s", path, what);
    return nullptr;
}

PyObject* read_points3d_bin(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    File fp(path);
    if (!fp.ok()) return io_error(path, "cannot open");

    uint64_t n;
    if (!fp.read(&n)) return io_error(path, "truncated header");
    // Sanity: counts are raw uint64 from the file — a corrupt/crafted file
    // could make n*3 wrap or a huge allocation abort the process. Each
    // record is at least 8(pid)+24(xyz)+3(rgb)+8(err)+8(track len) bytes.
    const long long fsize = fp.size();
    if (fsize < 0) return io_error(path, "cannot stat");
    if (n > static_cast<uint64_t>(fsize) / 51)
        return io_error(path, "corrupt header: point count exceeds file size");

    std::vector<double> xyz, err;
    std::vector<uint8_t> rgb;
    try {
        xyz.resize(static_cast<size_t>(n) * 3);
        err.resize(static_cast<size_t>(n));
        rgb.resize(static_cast<size_t>(n) * 3);
    } catch (const std::bad_alloc&) {
        return PyErr_NoMemory();
    }
    for (uint64_t i = 0; i < n; ++i) {
        uint64_t pid, tlen;
        if (!fp.read(&pid)) return io_error(path, "truncated point id");
        if (!fp.read(&xyz[i * 3], 3)) return io_error(path, "truncated xyz");
        if (!fp.read(&rgb[i * 3], 3)) return io_error(path, "truncated rgb");
        if (!fp.read(&err[i])) return io_error(path, "truncated error");
        if (!fp.read(&tlen)) return io_error(path, "truncated track len");
        if (tlen > static_cast<uint64_t>(fsize) / 8 ||
            !fp.skip(static_cast<long long>(tlen) * 8))
            return io_error(path, "truncated track");
    }
    PyObject* bx = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(xyz.data()), xyz.size() * 8);
    PyObject* br = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(rgb.data()), rgb.size());
    PyObject* be = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(err.data()), err.size() * 8);
    PyObject* out = Py_BuildValue("(NNNK)", bx, br, be,
                                  static_cast<unsigned long long>(n));
    return out;
}

PyObject* read_images_bin(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    File fp(path);
    if (!fp.ok()) return io_error(path, "cannot open");

    uint64_t n;
    if (!fp.read(&n)) return io_error(path, "truncated header");
    PyObject* list = PyList_New(static_cast<Py_ssize_t>(n));
    if (!list) return nullptr;

    for (uint64_t i = 0; i < n; ++i) {
        int32_t image_id, camera_id;
        double q[4], t[3];
        if (!fp.read(&image_id) || !fp.read(q, 4) || !fp.read(t, 3) ||
            !fp.read(&camera_id)) {
            Py_DECREF(list);
            return io_error(path, "truncated image record");
        }
        std::string name;
        for (;;) {
            char c;
            if (!fp.read(&c)) { Py_DECREF(list); return io_error(path, "truncated name"); }
            if (c == '\0') break;
            name.push_back(c);
        }
        uint64_t npts;
        if (!fp.read(&npts) || !fp.skip(static_cast<long>(npts * 24))) {
            Py_DECREF(list);
            return io_error(path, "truncated 2D points");
        }
        PyObject* rec = Py_BuildValue(
            "(i(dddd)(ddd)is)", image_id, q[0], q[1], q[2], q[3],
            t[0], t[1], t[2], camera_id, name.c_str());
        if (!rec) { Py_DECREF(list); return nullptr; }
        PyList_SET_ITEM(list, static_cast<Py_ssize_t>(i), rec);
    }
    return list;
}

// Minimal binary_little_endian PLY column reader for all-f32 (plus u8)
// property files — the Gaussian checkpoint schema. Returns
// (names, formats('f'|'B'), n, raw_interleaved_bytes).
PyObject* read_ply_raw(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    File fp(path);
    if (!fp.ok()) return io_error(path, "cannot open");

    char line[1024];
    std::vector<std::string> names;
    std::string formats;
    long n = -1;
    bool binary_le = false;
    if (!std::fgets(line, sizeof line, fp.f) ||
        std::strncmp(line, "ply", 3) != 0)
        return io_error(path, "not a PLY");
    while (std::fgets(line, sizeof line, fp.f)) {
        if (std::strncmp(line, "end_header", 10) == 0) break;
        char a[64], b[64], c[256];
        if (std::sscanf(line, "format %63s", a) == 1) {
            binary_le = std::strcmp(a, "binary_little_endian") == 0;
        } else if (std::sscanf(line, "element %63s %ld", a, &n) == 2) {
            if (std::strcmp(a, "vertex") != 0) n = -1;
        } else if (std::sscanf(line, "property %63s %255s", b, c) == 2) {
            if (n < 0) continue;  // properties of non-vertex elements
            if (std::strcmp(b, "float") == 0 || std::strcmp(b, "float32") == 0)
                formats.push_back('f');
            else if (std::strcmp(b, "uchar") == 0 || std::strcmp(b, "uint8") == 0)
                formats.push_back('B');
            else
                return io_error(path, "unsupported property type");
            names.emplace_back(c);
        }
    }
    if (!binary_le) return io_error(path, "not binary_little_endian");
    if (n < 0) return io_error(path, "no vertex element");

    size_t row = 0;
    for (char f : formats) row += (f == 'f') ? 4 : 1;
    std::vector<char> raw(static_cast<size_t>(n) * row);
    if (std::fread(raw.data(), 1, raw.size(), fp.f) != raw.size())
        return io_error(path, "truncated body");

    PyObject* pynames = PyList_New(static_cast<Py_ssize_t>(names.size()));
    for (size_t i = 0; i < names.size(); ++i)
        PyList_SET_ITEM(pynames, static_cast<Py_ssize_t>(i),
                        PyUnicode_FromString(names[i].c_str()));
    return Py_BuildValue(
        "(NslN)", pynames, formats.c_str(), n,
        PyBytes_FromStringAndSize(raw.data(),
                                  static_cast<Py_ssize_t>(raw.size())));
}

// Exact k-nearest-neighbour search over a float32 (n,3) cloud.
//
// Host-side counterpart of the reference's `simple-knn` CUDA module
// (`gaussian-splatting/submodules/simple-knn/simple_knn.cu:133-183`): the
// reference Morton-sorts into 1024-point boxes and prunes boxes by an AABB
// distance bound, which is an exact search. Here the same exactness comes
// from a uniform grid + expanding Chebyshev-ring scan with a ring-distance
// stopping bound. Used for Gaussian scale initialisation at scene load; the
// in-training-loop proximity search stays on-device (`ops/knn.py`).
//
//   knn3_exact(xyz_f32_bytes, n, k) -> (mean_d2 f32 bytes, idx i32 bytes)
//
// mean_d2[i] = mean of the k smallest squared distances from point i to the
// rest of the cloud; idx[i*k..] = the k neighbour indices, nearest first.

struct KnnBest {
    // Fixed-size max-root heap substitute: k is tiny (3), insertion sort
    // into a sorted array beats a heap and keeps the results ordered.
    float d2[16];
    int32_t id[16];
    int k, count = 0;
    explicit KnnBest(int kk) : k(kk) {}
    float worst() const { return count < k ? 3.4e38f : d2[k - 1]; }
    void offer(float dd, int32_t ii) {
        if (count == k && dd >= d2[k - 1]) return;
        int pos = count < k ? count : k - 1;
        while (pos > 0 && d2[pos - 1] > dd) {
            d2[pos] = d2[pos - 1];
            id[pos] = id[pos - 1];
            --pos;
        }
        d2[pos] = dd;
        id[pos] = ii;
        if (count < k) ++count;
    }
};

struct KnnGrid {
    const float* pts;
    int64_t n;
    int res;                      // cells per axis
    float lo[3], inv_edge, edge;
    std::vector<int32_t> cell_start;  // res^3 + 1 prefix offsets
    std::vector<int32_t> order;       // point ids grouped by cell

    int cell_of(float x, float y, float z, int* c) const {
        c[0] = std::min(res - 1, std::max(0, (int)((x - lo[0]) * inv_edge)));
        c[1] = std::min(res - 1, std::max(0, (int)((y - lo[1]) * inv_edge)));
        c[2] = std::min(res - 1, std::max(0, (int)((z - lo[2]) * inv_edge)));
        return (c[2] * res + c[1]) * res + c[0];
    }

    void build(const float* p, int64_t count) {
        pts = p;
        n = count;
        float hi[3];
        for (int a = 0; a < 3; ++a) { lo[a] = p[a]; hi[a] = p[a]; }
        for (int64_t i = 1; i < n; ++i)
            for (int a = 0; a < 3; ++a) {
                lo[a] = std::min(lo[a], p[i * 3 + a]);
                hi[a] = std::max(hi[a], p[i * 3 + a]);
            }
        float extent = std::max({hi[0] - lo[0], hi[1] - lo[1],
                                 hi[2] - lo[2], 1e-12f});
        // aim for ~1-2 points per occupied cell (dense clusters dominate the
        // scan cost; empty-cell ring visits are just a prefix-table compare)
        res = std::max(1, std::min(256, (int)std::cbrt((double)n * 2.0)));
        edge = extent / res * (1.0f + 1e-6f);
        inv_edge = 1.0f / edge;

        const int64_t ncells = (int64_t)res * res * res;
        cell_start.assign(ncells + 1, 0);
        order.resize(n);
        std::vector<int32_t> cell_id(n);
        int c[3];
        for (int64_t i = 0; i < n; ++i) {
            cell_id[i] = cell_of(p[i * 3], p[i * 3 + 1], p[i * 3 + 2], c);
            ++cell_start[cell_id[i] + 1];
        }
        for (int64_t i = 0; i < ncells; ++i) cell_start[i + 1] += cell_start[i];
        std::vector<int32_t> cursor(cell_start.begin(), cell_start.end() - 1);
        for (int64_t i = 0; i < n; ++i) order[cursor[cell_id[i]]++] = (int32_t)i;
    }

    void scan_cell(int cx, int cy, int cz, int64_t self, const float* q,
                   KnnBest& best) const {
        if (cx < 0 || cy < 0 || cz < 0 || cx >= res || cy >= res || cz >= res)
            return;
        const int64_t cell = ((int64_t)cz * res + cy) * res + cx;
        for (int32_t s = cell_start[cell]; s < cell_start[cell + 1]; ++s) {
            const int32_t j = order[s];
            if (j == self) continue;
            const float dx = q[0] - pts[j * 3];
            const float dy = q[1] - pts[j * 3 + 1];
            const float dz = q[2] - pts[j * 3 + 2];
            best.offer(dx * dx + dy * dy + dz * dz, j);
        }
    }

    void query(int64_t i, int k, float* mean_d2, int32_t* idx) const {
        const float* q = &pts[i * 3];
        KnnBest best(k);
        int c[3];
        cell_of(q[0], q[1], q[2], c);
        const int rmax = res;  // full sweep in the worst case → exact
        for (int r = 0; r <= rmax; ++r) {
            // Everything in a cell at Chebyshev ring r sits at distance
            // ≥ (r-1)·edge from q, so once the k-th best beats that bound
            // no farther ring can improve the answer.
            if (best.count == k) {
                const float bound = (r - 1) * edge;
                if (bound > 0 && best.worst() <= bound * bound) break;
            }
            if (r == 0) {
                scan_cell(c[0], c[1], c[2], i, q, best);
                continue;
            }
            // hollow shell: two full z-faces plus the four open rims
            for (int dz = -r; dz <= r; dz += 2 * r)
                for (int dy = -r; dy <= r; ++dy)
                    for (int dx = -r; dx <= r; ++dx)
                        scan_cell(c[0] + dx, c[1] + dy, c[2] + dz, i, q, best);
            for (int dz = -r + 1; dz <= r - 1; ++dz) {
                for (int dy = -r; dy <= r; dy += 2 * r)
                    for (int dx = -r; dx <= r; ++dx)
                        scan_cell(c[0] + dx, c[1] + dy, c[2] + dz, i, q, best);
                for (int dx = -r; dx <= r; dx += 2 * r)
                    for (int dy = -r + 1; dy <= r - 1; ++dy)
                        scan_cell(c[0] + dx, c[1] + dy, c[2] + dz, i, q, best);
            }
        }
        double acc = 0.0;
        for (int s = 0; s < best.count; ++s) acc += best.d2[s];
        mean_d2[i] = best.count ? (float)(acc / best.count) : 0.0f;
        for (int s = 0; s < k; ++s)
            idx[i * k + s] = s < best.count ? best.id[s] : -1;
    }
};

PyObject* knn3_exact(PyObject*, PyObject* args) {
    const char* buf;
    Py_ssize_t nbytes;
    long long n;
    int k;
    if (!PyArg_ParseTuple(args, "y#Li", &buf, &nbytes, &n, &k)) return nullptr;
    if (k < 1 || k > 16) {
        PyErr_SetString(PyExc_ValueError, "k must be in [1, 16]");
        return nullptr;
    }
    if (n < 0 || nbytes != (Py_ssize_t)(n * 3 * sizeof(float))) {
        PyErr_SetString(PyExc_ValueError, "buffer is not (n, 3) float32");
        return nullptr;
    }

    std::vector<float> mean_d2((size_t)n);
    std::vector<int32_t> idx((size_t)n * k);
    if (n > 0) {
        const float* pts = reinterpret_cast<const float*>(buf);
        Py_BEGIN_ALLOW_THREADS;
        KnnGrid grid;
        grid.build(pts, n);
        const int nthreads = std::max(
            1, std::min<int>(16, std::thread::hardware_concurrency()));
        std::vector<std::thread> pool;
        // walk queries in grid order (contiguous slice of `order` per
        // thread): neighbouring queries touch the same cells → cache-warm
        for (int t = 0; t < nthreads; ++t)
            pool.emplace_back([&, t] {
                const int64_t a = n * t / nthreads;
                const int64_t b = n * (t + 1) / nthreads;
                for (int64_t s = a; s < b; ++s)
                    grid.query(grid.order[s], k, mean_d2.data(), idx.data());
            });
        for (auto& th : pool) th.join();
        Py_END_ALLOW_THREADS;
    }

    return Py_BuildValue(
        "(NN)",
        PyBytes_FromStringAndSize(reinterpret_cast<const char*>(mean_d2.data()),
                                  (Py_ssize_t)(mean_d2.size() * 4)),
        PyBytes_FromStringAndSize(reinterpret_cast<const char*>(idx.data()),
                                  (Py_ssize_t)(idx.size() * 4)));
}

PyMethodDef methods[] = {
    {"knn3_exact", knn3_exact, METH_VARARGS,
     "exact k-NN: (xyz f32 bytes, n, k) -> (mean_d2 f32 bytes, idx i32 bytes)"},
    {"read_points3d_bin", read_points3d_bin, METH_VARARGS,
     "COLMAP points3D.bin -> (xyz f64 bytes, rgb u8 bytes, err f64 bytes, n)"},
    {"read_images_bin", read_images_bin, METH_VARARGS,
     "COLMAP images.bin -> list[(id, qvec, tvec, camera_id, name)]"},
    {"read_ply_raw", read_ply_raw, METH_VARARGS,
     "binary PLY -> (names, formats, n, raw bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "fastio",
                         "native scene-IO accelerator", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_fastio(void) { return PyModule_Create(&moduledef); }
