// CPython extension: one-shot scalar fast path for rapidfuzz_tpu.
//
// The pure-Python scalar path costs 15-60 us/call (encode_one, numpy
// cutoff algebra, ctypes marshalling); the reference's one-shot calls run
// in ~0.05-2 us (rapidfuzz-benches charts, BASELINE.md).  This module
// reads str/bytes inputs directly via the CPython C API (PEP 393 code
// points == the codec's encoding for str; byte values for bytes) and
// calls the same oracle kernels in-process — no numpy, no ctypes.
//
// Routing mirrors rapidfuzz_tpu.oracle.levenshtein_uniform_auto and the
// *_bp wrappers (levenshtein.rs:1104-1222 one-shot ladder semantics).
// Unsupported input types return Py_None; the Python wrappers fall back
// to the general encoder path.
//
// Build: g++ -O2 -march=native -ffp-contract=off -shared -fPIC
//        -I$(python -c "import sysconfig; print(sysconfig.get_path('include'))")
//        -o _rf_scalar.so rf_scalar.cpp

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "oracle.cpp"

namespace {

constexpr int64_t BP_MIN_CELLS = 64;      // oracle.__init__._BP_MIN_CELLS

struct Buf {
    int64_t stackbuf[512];
    int64_t* p = stackbuf;
    Py_ssize_t n = 0;
    bool owned = false;
    ~Buf() {
        if (owned) free(p);
    }
};

// str/bytes -> int64 element buffer (codec.encode_one semantics).
// Returns false for any other type (caller falls back to Python).
static bool load_seq(PyObject* o, Buf& b) {
    if (PyUnicode_Check(o)) {
        Py_ssize_t n = PyUnicode_GET_LENGTH(o);
        if (n > (Py_ssize_t)(sizeof(b.stackbuf) / 8)) {
            b.p = (int64_t*)malloc((size_t)n * 8);
            if (!b.p) return false;
            b.owned = true;
        }
        int kind = PyUnicode_KIND(o);
        const void* data = PyUnicode_DATA(o);
        for (Py_ssize_t i = 0; i < n; i++)
            b.p[i] = (int64_t)PyUnicode_READ(kind, data, i);
        b.n = n;
        return true;
    }
    if (PyBytes_Check(o)) {
        Py_ssize_t n = PyBytes_GET_SIZE(o);
        if (n > (Py_ssize_t)(sizeof(b.stackbuf) / 8)) {
            b.p = (int64_t*)malloc((size_t)n * 8);
            if (!b.p) return false;
            b.owned = true;
        }
        const unsigned char* d = (const unsigned char*)PyBytes_AS_STRING(o);
        for (Py_ssize_t i = 0; i < n; i++) b.p[i] = d[i];
        b.n = n;
        return true;
    }
    return false;
}

// uniform Levenshtein with the one-shot routing ladder: exact when the
// result is <= cutoff (cutoff < 0: none), else any value > cutoff.
static int64_t lev_auto(const int64_t* a, int64_t m, const int64_t* b,
                        int64_t n, int64_t cutoff, int64_t hint) {
    if (m * n <= BP_MIN_CELLS) {
        int64_t d = rf_levenshtein_uniform(a, m, b, n);
        return (cutoff >= 0 && d > cutoff) ? cutoff + 1 : d;
    }
    if (cutoff >= 0 && (hint < 0 || hint >= cutoff))
        return rf_levenshtein_uniform_bp(a, m, b, n, cutoff);
    int64_t lim0 = m > n ? m : n;
    if (cutoff < 0 && hint < 0 && lim0 <= 512)
        return rf_levenshtein_uniform_bp(a, m, b, n, -1);  // ladder loses
    int64_t ldiff = m > n ? m - n : n - m;
    int64_t k = hint >= 0 ? hint : 64;
    if (k < ldiff) k = ldiff;
    if (k < 16) k = 16;
    int64_t lim = m > n ? m : n;
    while (true) {
        if (cutoff >= 0 && k > cutoff) k = cutoff;
        int64_t r = rf_levenshtein_uniform_bp(a, m, b, n, k);
        if (r <= k || k >= lim || (cutoff >= 0 && k >= cutoff)) return r;
        k = k * 4 < lim ? k * 4 : lim;
    }
}

#define LOAD2_OR_NONE()                              \
    Buf a, b;                                        \
    if (!load_seq(s1, a) || !load_seq(s2, b)) {      \
        Py_RETURN_NONE;                              \
    }

static PyObject* py_lev_uniform(PyObject*, PyObject* const* args,
                                Py_ssize_t nargs) {
    if (nargs != 4) {
        PyErr_SetString(PyExc_TypeError, "lev_uniform(s1, s2, cutoff, hint)");
        return nullptr;
    }
    PyObject* s1 = args[0];
    PyObject* s2 = args[1];
    int64_t cutoff = PyLong_AsLongLong(args[2]);
    int64_t hint = PyLong_AsLongLong(args[3]);
    if (PyErr_Occurred()) return nullptr;
    LOAD2_OR_NONE();
    return PyLong_FromLongLong(lev_auto(a.p, a.n, b.p, b.n, cutoff, hint));
}

static PyObject* py_lev_weighted(PyObject*, PyObject* const* args,
                                 Py_ssize_t nargs) {
    if (nargs != 5) {
        PyErr_SetString(PyExc_TypeError,
                        "lev_weighted(s1, s2, ins, del, sub)");
        return nullptr;
    }
    PyObject* s1 = args[0];
    PyObject* s2 = args[1];
    int64_t ins = PyLong_AsLongLong(args[2]);
    int64_t dele = PyLong_AsLongLong(args[3]);
    int64_t sub = PyLong_AsLongLong(args[4]);
    if (PyErr_Occurred()) return nullptr;
    LOAD2_OR_NONE();
    return PyLong_FromLongLong(
        rf_levenshtein_weighted(a.p, a.n, b.p, b.n, ins, dele, sub));
}

// metric id dispatch for the int metrics sharing the (s1, s2) signature
enum Metric { M_INDEL = 0, M_LCS = 1, M_OSA = 2, M_DAMERAU = 3,
              M_HAMMING = 4, M_PREFIX = 5, M_POSTFIX = 6 };

static PyObject* py_int_metric(PyObject*, PyObject* const* args,
                               Py_ssize_t nargs) {
    if (nargs != 3) {
        PyErr_SetString(PyExc_TypeError, "int_metric(metric_id, s1, s2)");
        return nullptr;
    }
    long id = PyLong_AsLong(args[0]);
    PyObject* s1 = args[1];
    PyObject* s2 = args[2];
    if (PyErr_Occurred()) return nullptr;
    LOAD2_OR_NONE();
    int64_t big = a.n * b.n > BP_MIN_CELLS;
    int64_t r;
    switch (id) {
        case M_INDEL:
            r = big ? rf_indel_bp(a.p, a.n, b.p, b.n)
                    : rf_indel(a.p, a.n, b.p, b.n);
            break;
        case M_LCS:
            r = big ? rf_lcs_seq_bp(a.p, a.n, b.p, b.n)
                    : rf_lcs_seq(a.p, a.n, b.p, b.n);
            break;
        case M_OSA:
            r = big ? rf_osa_bp(a.p, a.n, b.p, b.n)
                    : rf_osa(a.p, a.n, b.p, b.n);
            break;
        case M_DAMERAU:
            r = rf_damerau(a.p, a.n, b.p, b.n);
            break;
        case M_HAMMING:
            r = rf_hamming(a.p, a.n, b.p, b.n);
            break;
        case M_PREFIX:
            r = rf_prefix_sim(a.p, a.n, b.p, b.n);
            break;
        case M_POSTFIX:
            r = rf_postfix_sim(a.p, a.n, b.p, b.n);
            break;
        default:
            PyErr_SetString(PyExc_ValueError, "unknown metric id");
            return nullptr;
    }
    return PyLong_FromLongLong(r);
}

static PyObject* py_jaro(PyObject*, PyObject* const* args,
                         Py_ssize_t nargs) {
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "jaro(s1, s2)");
        return nullptr;
    }
    PyObject* s1 = args[0];
    PyObject* s2 = args[1];
    LOAD2_OR_NONE();
    return PyFloat_FromDouble(rf_jaro(a.p, a.n, b.p, b.n));
}

static PyObject* py_jaro_winkler(PyObject*, PyObject* const* args,
                                 Py_ssize_t nargs) {
    if (nargs != 3) {
        PyErr_SetString(PyExc_TypeError, "jaro_winkler(s1, s2, pw)");
        return nullptr;
    }
    PyObject* s1 = args[0];
    PyObject* s2 = args[1];
    double pw = PyFloat_AsDouble(args[2]);
    if (PyErr_Occurred()) return nullptr;
    LOAD2_OR_NONE();
    return PyFloat_FromDouble(rf_jaro_winkler(a.p, a.n, b.p, b.n, pw));
}

static PyMethodDef methods[] = {
    {"lev_uniform", (PyCFunction)py_lev_uniform, METH_FASTCALL, nullptr},
    {"lev_weighted", (PyCFunction)py_lev_weighted, METH_FASTCALL, nullptr},
    {"int_metric", (PyCFunction)py_int_metric, METH_FASTCALL, nullptr},
    {"jaro", (PyCFunction)py_jaro, METH_FASTCALL, nullptr},
    {"jaro_winkler", (PyCFunction)py_jaro_winkler, METH_FASTCALL, nullptr},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_rf_scalar",
    "One-shot scalar fast path (C, in-process)", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

extern "C" PyObject* PyInit__rf_scalar(void) {
    return PyModule_Create(&moduledef);
}
