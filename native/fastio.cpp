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

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
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

PyMethodDef methods[] = {
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
