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

#include <cmath>
#include <cstddef>

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

// Raw uint8 view of a str (PEP 393 kind-1 == latin-1 code points, which
// equal the codec's encoding) or bytes object — no copy, no conversion.
// Returns false for wider strings / other types.
static bool raw_u8(PyObject* o, const uint8_t** p, Py_ssize_t* n) {
    if (PyUnicode_Check(o)) {
        if (PyUnicode_KIND(o) != PyUnicode_1BYTE_KIND) return false;
        *p = PyUnicode_1BYTE_DATA(o);
        *n = PyUnicode_GET_LENGTH(o);
        return true;
    }
    if (PyBytes_Check(o)) {
        *p = (const uint8_t*)PyBytes_AS_STRING(o);
        *n = PyBytes_GET_SIZE(o);
        return true;
    }
    return false;
}

// uniform Levenshtein with the one-shot routing ladder: exact when the
// result is <= cutoff (cutoff < 0: none), else any value > cutoff.
static int64_t lev_auto(const int64_t* a, int64_t m, const int64_t* b,
                        int64_t n, int64_t cutoff, int64_t hint) {
    // tiny cutoffs ride the mbleven short-circuit inside the bp wrapper
    // (levenshtein.rs:1142-1144 ladder position) at ANY length
    if (cutoff >= 0 && cutoff < 4)
        return rf_levenshtein_uniform_bp(a, m, b, n, cutoff);
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
    const uint8_t *ra, *rb;
    Py_ssize_t rna, rnb;
    if (raw_u8(s1, &ra, &rna) && raw_u8(s2, &rb, &rnb)) {
        int64_t d = rf_levenshtein_uniform_bp_u8(ra, rna, rb, rnb, cutoff);
        if (d != INT64_MIN) return PyLong_FromLongLong(d);
    }
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
    const uint8_t *ra, *rb;
    Py_ssize_t rna, rnb;
    if (raw_u8(s1, &ra, &rna) && raw_u8(s2, &rb, &rnb)) {
        int64_t r = INT64_MIN;
        switch (id) {
            case M_INDEL:   r = rf_indel_bp_u8(ra, rna, rb, rnb); break;
            case M_LCS:     r = rf_lcs_seq_bp_u8(ra, rna, rb, rnb); break;
            case M_OSA:     r = rf_osa_bp_u8(ra, rna, rb, rnb); break;
            case M_HAMMING: r = rf_hamming_u8(ra, rna, rb, rnb); break;
            case M_PREFIX:  r = rf_prefix_sim_u8(ra, rna, rb, rnb); break;
            case M_POSTFIX: r = rf_postfix_sim_u8(ra, rna, rb, rnb); break;
            default: break;                    // damerau: conversion path
        }
        if (r != INT64_MIN) return PyLong_FromLongLong(r);
    }
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

// ---- C-level public metric callables ----------------------------------
// The pure-Python wrapper stack (public closure -> module _fast_distance
// -> extension call) costs ~250-350 ns per call — about half the total
// one-shot latency at the reference's criterion lengths (50-500 ns band,
// BASELINE.md).  FastMetric is a vectorcall object bound directly to the
// public module names (`indel.distance` etc.): it runs the str/bytes u8
// fast lane end-to-end in C (kernel + cutoff algebra + None/int/float
// result) and delegates everything else — wide strings, exotic cutoff
// types, device backend, non-str inputs — to the original Python closure.

typedef struct {
    PyObject_HEAD
    vectorcallfunc vcall;
    PyObject* dict;                  // __doc__ / __name__ / __module__
    PyObject* fallback;              // the original Python closure
    long id;                         // Metric enum; 7 = uniform Levenshtein
                                     // 8 = jaro, 9 = jaro_winkler (f64)
    int kind;                        // 0 dist, 1 sim, 2 ndist, 3 nsim
    int maxcode;                     // 0: max(l1,l2); 1: l1+l2
} FastMetricObj;

static PyObject* fm_fallback(FastMetricObj* self, PyObject* const* args,
                             size_t nargsf, PyObject* kwnames) {
    return PyObject_Vectorcall(self->fallback, args, nargsf, kwnames);
}

static PyObject* fm_vectorcall(PyObject* self_, PyObject* const* args,
                               size_t nargsf, PyObject* kwnames) {
    FastMetricObj* self = (FastMetricObj*)self_;
    Py_ssize_t nargs = PyVectorcall_NARGS(nargsf);
    if (nargs != 2) return fm_fallback(self, args, nargsf, kwnames);
    PyObject* cutoff = Py_None;
    double pw = 0.1;                 // jaro_winkler prefix_weight default
    if (kwnames) {
        Py_ssize_t nk = PyTuple_GET_SIZE(kwnames);
        for (Py_ssize_t i = 0; i < nk; i++) {
            PyObject* k = PyTuple_GET_ITEM(kwnames, i);
            if (PyUnicode_CompareWithASCIIString(k, "score_cutoff") == 0)
                cutoff = args[2 + i];
            else if (self->id == 9
                     && PyUnicode_CompareWithASCIIString(
                            k, "prefix_weight") == 0) {
                pw = PyFloat_AsDouble(args[2 + i]);
                if (pw == -1.0 && PyErr_Occurred()) {
                    PyErr_Clear();
                    return fm_fallback(self, args, nargsf, kwnames);
                }
            } else if (PyUnicode_CompareWithASCIIString(k, "score_hint")
                       != 0)   // hint never changes results; others: punt
                return fm_fallback(self, args, nargsf, kwnames);
        }
    }
    {
        const char* bk = getenv("RAPIDFUZZ_TPU_SCALAR_BACKEND");
        if (bk && strcmp(bk, "device") == 0)
            return fm_fallback(self, args, nargsf, kwnames);
    }
    double c = 0.0;
    if (cutoff != Py_None) {
        c = PyFloat_AsDouble(cutoff);
        if (c == -1.0 && PyErr_Occurred()) {
            PyErr_Clear();               // exotic cutoff type: Python path
            return fm_fallback(self, args, nargsf, kwnames);
        }
    }
    if (self->id >= 8) {                 // jaro family (f64, any unicode)
        Buf a, b;
        if (!load_seq(args[0], a) || !load_seq(args[1], b))
            return fm_fallback(self, args, nargsf, kwnames);
        double s = self->id == 8
                       ? rf_jaro(a.p, a.n, b.p, b.n)
                       : rf_jaro_winkler(a.p, a.n, b.p, b.n, pw);
        bool is_sim = self->kind == 1 || self->kind == 3;
        double v = is_sim ? s : 1.0 - s;
        if (cutoff != Py_None && !(is_sim ? v >= c : v <= c))
            Py_RETURN_NONE;
        return PyFloat_FromDouble(v);
    }
    if (self->id == M_DAMERAU) {     // O(N*M) scalar; any unicode width
        Buf a, b;
        if (!load_seq(args[0], a) || !load_seq(args[1], b))
            return fm_fallback(self, args, nargsf, kwnames);
        int64_t dd = rf_damerau(a.p, a.n, b.p, b.n);
        int64_t mx = a.n > b.n ? a.n : b.n;
        switch (self->kind) {
            case 0:
                if (cutoff != Py_None && !((double)dd <= c)) Py_RETURN_NONE;
                return PyLong_FromLongLong(dd);
            case 1: {
                int64_t s = mx - dd;
                if (cutoff != Py_None && !((double)s >= c)) Py_RETURN_NONE;
                return PyLong_FromLongLong(s);
            }
            case 2: {
                double nd = mx ? (double)dd / (double)mx : 0.0;
                if (cutoff != Py_None && !(nd <= c)) Py_RETURN_NONE;
                return PyFloat_FromDouble(nd);
            }
            default: {
                double nd = mx ? (double)dd / (double)mx : 0.0;
                double ns_ = 1.0 - nd;
                if (cutoff != Py_None && !(ns_ >= c)) Py_RETURN_NONE;
                return PyFloat_FromDouble(ns_);
            }
        }
    }
    const uint8_t *ra, *rb;
    Py_ssize_t na, nb2;
    if (!raw_u8(args[0], &ra, &na) || !raw_u8(args[1], &rb, &nb2))
        return fm_fallback(self, args, nargsf, kwnames);
    int64_t mx64 = self->maxcode ? (int64_t)(na + nb2)
                                 : (int64_t)(na > nb2 ? na : nb2);
    int64_t d;
    bool short_done = false;
    // indel/LCS tiny-cutoff short-circuit (lcs_seq.rs:488-532 ladder
    // position): map the kind's cutoff to an integer indel-distance
    // miss budget; <= 4 misses rides the op-script walk
    // (oracle.cpp indel_mbleven) instead of the full bit-parallel
    // pass.  Normalized kinds over-approximate with ceil
    // (distance.rs:230-244); the exact recheck below stays
    // authoritative, so a budget-exceeded result can only turn into
    // None, never a wrong score.
    if (cutoff != Py_None && (self->id == M_INDEL || self->id == M_LCS)
            && c < 9.0e18 && c > -9.0e18) {
        int64_t delta = na > nb2 ? (int64_t)(na - nb2)
                                 : (int64_t)(nb2 - na);
        int64_t tot = (int64_t)(na + nb2);
        int64_t kmiss;
        if (self->id == M_INDEL) {
            switch (self->kind) {
                case 0: kmiss = (int64_t)floor(c); break;
                case 1: kmiss = tot - (int64_t)ceil(c); break;
                case 2: kmiss = (int64_t)ceil(c * (double)tot); break;
                default:
                    kmiss = (int64_t)ceil((1.0 - c) * (double)tot);
            }
        } else {              // M_LCS distance dl: di = 2*dl - delta
            switch (self->kind) {
                case 0: kmiss = 2 * (int64_t)floor(c) - delta; break;
                case 1: kmiss = tot - 2 * (int64_t)ceil(c); break;
                case 2:
                    kmiss = 2 * (int64_t)ceil(c * (double)mx64) - delta;
                    break;
                default:
                    kmiss = 2 * (int64_t)ceil((1.0 - c) * (double)mx64)
                            - delta;
            }
        }
        if (kmiss < 0) Py_RETURN_NONE;      // can't pass the cutoff
        if (kmiss <= 4) {
            int64_t di = rf_indel_bp_u8_cut(ra, na, rb, nb2, kmiss);
            if (self->id == M_INDEL) {
                d = di;
            } else {
                if (di > kmiss) Py_RETURN_NONE;
                d = (di + delta) / 2;
            }
            short_done = true;
        }
    }
    if (short_done) {
        // fall through to the shared cutoff algebra below
    } else
    switch (self->id) {
        case M_INDEL: d = rf_indel_bp_u8(ra, na, rb, nb2); break;
        case M_LCS: {
            int64_t l = rf_lcs_seq_bp_u8(ra, na, rb, nb2);
            d = (l == INT64_MIN) ? INT64_MIN : mx64 - l;
            break;
        }
        case M_OSA: d = rf_osa_bp_u8(ra, na, rb, nb2); break;
        case M_HAMMING:
            // default pad=False: unequal lengths raise in Python
            if (na != nb2) return fm_fallback(self, args, nargsf, kwnames);
            d = rf_hamming_u8(ra, na, rb, nb2);
            break;
        case M_PREFIX: d = mx64 - rf_prefix_sim_u8(ra, na, rb, nb2); break;
        case M_POSTFIX: d = mx64 - rf_postfix_sim_u8(ra, na, rb, nb2); break;
        case 7: {                        // uniform Levenshtein
            int64_t kc = -1;
            if (self->kind == 0 && cutoff != Py_None) {
                if (c < 0) Py_RETURN_NONE;      // d >= 0 can never pass
                kc = c < 9.0e18 ? (int64_t)c : -1;
            }
            d = rf_levenshtein_uniform_bp_u8(ra, na, rb, nb2, kc);
            break;
        }
        default: d = INT64_MIN;
    }
    if (d == INT64_MIN) return fm_fallback(self, args, nargsf, kwnames);
    switch (self->kind) {
        case 0:                          // distance, cutoff keeps d <= c
            if (cutoff != Py_None && !((double)d <= c)) Py_RETURN_NONE;
            return PyLong_FromLongLong(d);
        case 1: {                        // similarity, keeps s >= c
            int64_t s = mx64 - d;
            if (cutoff != Py_None && !((double)s >= c)) Py_RETURN_NONE;
            return PyLong_FromLongLong(s);
        }
        case 2: {                        // normalized distance, nd <= c
            double nd = mx64 ? (double)d / (double)mx64 : 0.0;
            if (cutoff != Py_None && !(nd <= c)) Py_RETURN_NONE;
            return PyFloat_FromDouble(nd);
        }
        default: {                       // normalized similarity, ns >= c
            double nd = mx64 ? (double)d / (double)mx64 : 0.0;
            double ns_ = 1.0 - nd;
            if (cutoff != Py_None && !(ns_ >= c)) Py_RETURN_NONE;
            return PyFloat_FromDouble(ns_);
        }
    }
}

static void fm_dealloc(PyObject* self_) {
    FastMetricObj* s = (FastMetricObj*)self_;
    Py_XDECREF(s->dict);
    Py_XDECREF(s->fallback);
    PyObject_Free(self_);
}

static PyTypeObject FastMetric_Type = {
    PyVarObject_HEAD_INIT(nullptr, 0)
    "_rf_scalar.FastMetric",             /* tp_name */
    sizeof(FastMetricObj),               /* tp_basicsize */
    0,                                   /* tp_itemsize */
    fm_dealloc,                          /* tp_dealloc */
    offsetof(FastMetricObj, vcall),      /* tp_vectorcall_offset */
    nullptr, nullptr, nullptr, nullptr,  /* getattr..repr */
    nullptr, nullptr, nullptr,           /* as_number..as_mapping */
    nullptr,                             /* tp_hash */
    PyVectorcall_Call,                   /* tp_call */
    nullptr,                             /* tp_str */
    PyObject_GenericGetAttr,             /* tp_getattro */
    PyObject_GenericSetAttr,             /* tp_setattro */
    nullptr,                             /* tp_as_buffer */
    Py_TPFLAGS_DEFAULT | Py_TPFLAGS_HAVE_VECTORCALL,  /* tp_flags */
    nullptr,                             /* tp_doc */
    nullptr, nullptr, nullptr,           /* traverse, clear, richcmp */
    0,                                   /* tp_weaklistoffset */
    nullptr, nullptr,                    /* iter, iternext */
    nullptr, nullptr, nullptr,           /* methods, members, getset */
    nullptr, nullptr,                    /* base, dict */
    nullptr, nullptr,                    /* descr_get, descr_set */
    offsetof(FastMetricObj, dict),       /* tp_dictoffset */
};

// make_metric_fn(id, kind, maxcode, fallback) -> FastMetric callable
static PyObject* py_make_metric_fn(PyObject*, PyObject* const* args,
                                   Py_ssize_t nargs) {
    if (nargs != 4) {
        PyErr_SetString(PyExc_TypeError,
                        "make_metric_fn(id, kind, maxcode, fallback)");
        return nullptr;
    }
    long id = PyLong_AsLong(args[0]);
    long kind = PyLong_AsLong(args[1]);
    long maxcode = PyLong_AsLong(args[2]);
    if (PyErr_Occurred()) return nullptr;
    FastMetricObj* o = PyObject_New(FastMetricObj, &FastMetric_Type);
    if (!o) return nullptr;
    o->vcall = fm_vectorcall;
    o->dict = PyDict_New();
    o->id = id;
    o->kind = (int)kind;
    o->maxcode = (int)maxcode;
    Py_INCREF(args[3]);
    o->fallback = args[3];
    if (!o->dict) { Py_DECREF(o); return nullptr; }
    return (PyObject*)o;
}

static PyMethodDef methods[] = {
    {"lev_uniform", (PyCFunction)py_lev_uniform, METH_FASTCALL, nullptr},
    {"lev_weighted", (PyCFunction)py_lev_weighted, METH_FASTCALL, nullptr},
    {"int_metric", (PyCFunction)py_int_metric, METH_FASTCALL, nullptr},
    {"jaro", (PyCFunction)py_jaro, METH_FASTCALL, nullptr},
    {"jaro_winkler", (PyCFunction)py_jaro_winkler, METH_FASTCALL, nullptr},
    {"make_metric_fn", (PyCFunction)py_make_metric_fn, METH_FASTCALL,
     nullptr},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_rf_scalar",
    "One-shot scalar fast path (C, in-process)", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

extern "C" PyObject* PyInit__rf_scalar(void) {
    if (PyType_Ready(&FastMetric_Type) < 0) return nullptr;
    return PyModule_Create(&moduledef);
}
