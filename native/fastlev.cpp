// fastlev — C++ edit-distance kernels for bench scoring (CER/WER/fuzzy find).
//
// The bench scorer (karanta_tpu/bench/scoring.py) runs Levenshtein over whole
// OCR'd documents; the O(n*m) inner loop is this framework's hottest
// host-side code after PDF decode. CPython extension (no pybind11 in this
// image); scoring.py imports it when built and falls back to Python.
//
// Exposed functions:
//   edit_distance(a: str, b: str, limit: int = -1) -> int
//   fuzzy_contains(haystack: str, needle: str, max_diffs: int) -> bool

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

// Read a Python str into UTF-32 code points.
static bool read_unicode(PyObject* obj, std::vector<uint32_t>& out) {
    if (!PyUnicode_Check(obj)) {
        PyErr_SetString(PyExc_TypeError, "expected str");
        return false;
    }
    Py_ssize_t n = PyUnicode_GET_LENGTH(obj);
    out.resize(static_cast<size_t>(n));
    int kind = PyUnicode_KIND(obj);
    const void* data = PyUnicode_DATA(obj);
    for (Py_ssize_t i = 0; i < n; i++) {
        out[static_cast<size_t>(i)] = PyUnicode_READ(kind, data, i);
    }
    return true;
}

// Banded Levenshtein with optional early exit when the distance exceeds
// `limit` (returns limit + 1 in that case, matching the Python fallback).
static int64_t levenshtein(const std::vector<uint32_t>& a,
                           const std::vector<uint32_t>& b, int64_t limit) {
    const std::vector<uint32_t>& s = (a.size() <= b.size()) ? a : b;
    const std::vector<uint32_t>& t = (a.size() <= b.size()) ? b : a;
    const int64_t n = static_cast<int64_t>(s.size());
    const int64_t m = static_cast<int64_t>(t.size());
    if (limit >= 0 && m - n > limit) return limit + 1;
    if (n == 0) return m;

    std::vector<int64_t> prev(static_cast<size_t>(n) + 1);
    std::vector<int64_t> cur(static_cast<size_t>(n) + 1);
    for (int64_t j = 0; j <= n; j++) prev[static_cast<size_t>(j)] = j;

    for (int64_t i = 1; i <= m; i++) {
        cur[0] = i;
        int64_t row_min = i;
        const uint32_t tc = t[static_cast<size_t>(i - 1)];
        for (int64_t j = 1; j <= n; j++) {
            const int64_t sub =
                prev[static_cast<size_t>(j - 1)] +
                (s[static_cast<size_t>(j - 1)] != tc ? 1 : 0);
            const int64_t del = prev[static_cast<size_t>(j)] + 1;
            const int64_t ins = cur[static_cast<size_t>(j - 1)] + 1;
            const int64_t v = std::min(sub, std::min(del, ins));
            cur[static_cast<size_t>(j)] = v;
            row_min = std::min(row_min, v);
        }
        if (limit >= 0 && row_min > limit) return limit + 1;
        std::swap(prev, cur);
    }
    return prev[static_cast<size_t>(n)];
}

static PyObject* py_edit_distance(PyObject*, PyObject* args) {
    PyObject* a_obj;
    PyObject* b_obj;
    long long limit = -1;
    if (!PyArg_ParseTuple(args, "OO|L", &a_obj, &b_obj, &limit)) return nullptr;
    std::vector<uint32_t> a, b;
    if (!read_unicode(a_obj, a) || !read_unicode(b_obj, b)) return nullptr;
    int64_t result;
    Py_BEGIN_ALLOW_THREADS
    result = levenshtein(a, b, limit);
    Py_END_ALLOW_THREADS
    return PyLong_FromLongLong(result);
}

// Sellers' algorithm: minimal edit distance of `needle` against any substring
// of `haystack` (free start/end in haystack). True iff min distance <= k.
static bool fuzzy_search(const std::vector<uint32_t>& haystack,
                         const std::vector<uint32_t>& needle, int64_t k) {
    const int64_t n = static_cast<int64_t>(needle.size());
    if (n == 0) return true;
    std::vector<int64_t> prev(static_cast<size_t>(n) + 1);
    std::vector<int64_t> cur(static_cast<size_t>(n) + 1);
    for (int64_t j = 0; j <= n; j++) prev[static_cast<size_t>(j)] = j;
    for (size_t i = 0; i < haystack.size(); i++) {
        cur[0] = 0;  // free start anywhere in haystack
        const uint32_t hc = haystack[i];
        for (int64_t j = 1; j <= n; j++) {
            const int64_t sub =
                prev[static_cast<size_t>(j - 1)] +
                (needle[static_cast<size_t>(j - 1)] != hc ? 1 : 0);
            const int64_t del = cur[static_cast<size_t>(j - 1)] + 1;
            const int64_t ins = prev[static_cast<size_t>(j)] + 1;
            cur[static_cast<size_t>(j)] = std::min(sub, std::min(del, ins));
        }
        if (cur[static_cast<size_t>(n)] <= k) return true;
        std::swap(prev, cur);
    }
    return prev[static_cast<size_t>(n)] <= k;
}

static PyObject* py_fuzzy_contains(PyObject*, PyObject* args) {
    PyObject* h_obj;
    PyObject* n_obj;
    long long k = 0;
    if (!PyArg_ParseTuple(args, "OO|L", &h_obj, &n_obj, &k)) return nullptr;
    std::vector<uint32_t> haystack, needle;
    if (!read_unicode(h_obj, haystack) || !read_unicode(n_obj, needle)) {
        return nullptr;
    }
    bool found;
    Py_BEGIN_ALLOW_THREADS
    found = fuzzy_search(haystack, needle, k);
    Py_END_ALLOW_THREADS
    if (found) Py_RETURN_TRUE;
    Py_RETURN_FALSE;
}

static PyMethodDef kMethods[] = {
    {"edit_distance", py_edit_distance, METH_VARARGS,
     "edit_distance(a, b, limit=-1) -> int"},
    {"fuzzy_contains", py_fuzzy_contains, METH_VARARGS,
     "fuzzy_contains(haystack, needle, max_diffs=0) -> bool"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "fastlev",
    "C++ edit-distance kernels for OCR bench scoring", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_fastlev(void) { return PyModule_Create(&kModule); }
