"""C++ scalar oracle: build-on-first-use ctypes bindings.

The shared library is compiled from ``native/oracle.cpp`` on first import
and cached next to the package.  It serves two roles:

1. conformance oracle for the device kernels (tests),
2. host fast path for tiny one-shot API calls, where a device round trip
   (~100us) would dwarf the compute (the reference's one-shot calls are
   ~1us; see BASELINE.md).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_ROOT, "native", "oracle.cpp")
_SO = os.path.join(_HERE, "_librf_oracle.so")

_lock = threading.Lock()
_lib = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # -ffp-contract=off: no FMA contraction, so f64 scores match numpy's
    # strict IEEE evaluation bit-for-bit (ULP conformance target)
    cmd = ["g++", "-O2", "-march=native", "-ffp-contract=off", "-shared",
           "-fPIC", "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"") or b""
        raise RuntimeError(f"oracle build failed: {out.decode()[:2000]}") from e
    os.replace(_SO + ".tmp", _SO)
    return _SO


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            i64 = ctypes.c_int64
            p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            dbl = ctypes.c_double

            lib.rf_levenshtein_uniform.restype = i64
            lib.rf_levenshtein_uniform.argtypes = [p64, i64, p64, i64]
            lib.rf_levenshtein_uniform_banded.restype = i64
            lib.rf_levenshtein_uniform_banded.argtypes = [p64, i64, p64, i64]
            lib.rf_levenshtein_weighted.restype = i64
            lib.rf_levenshtein_weighted.argtypes = [p64, i64, p64, i64, i64, i64, i64]
            lib.rf_lcs_seq.restype = i64
            lib.rf_lcs_seq.argtypes = [p64, i64, p64, i64]
            lib.rf_indel.restype = i64
            lib.rf_indel.argtypes = [p64, i64, p64, i64]
            lib.rf_osa.restype = i64
            lib.rf_osa.argtypes = [p64, i64, p64, i64]
            lib.rf_damerau.restype = i64
            lib.rf_damerau.argtypes = [p64, i64, p64, i64]
            lib.rf_damerau_rows.restype = i64
            lib.rf_damerau_rows.argtypes = [p64, i64, p64, i64]
            lib.rf_hamming.restype = i64
            lib.rf_hamming.argtypes = [p64, i64, p64, i64]
            lib.rf_prefix_sim.restype = i64
            lib.rf_prefix_sim.argtypes = [p64, i64, p64, i64]
            lib.rf_postfix_sim.restype = i64
            lib.rf_postfix_sim.argtypes = [p64, i64, p64, i64]
            lib.rf_jaro.restype = dbl
            lib.rf_jaro.argtypes = [p64, i64, p64, i64]
            lib.rf_jaro_winkler.restype = dbl
            lib.rf_jaro_winkler.argtypes = [p64, i64, p64, i64, dbl]
            lib.rf_partial_ratio.restype = dbl
            lib.rf_partial_ratio.argtypes = [p64, i64, p64, i64]
            lib.rf_levenshtein_uniform_1vN.restype = None
            lib.rf_levenshtein_uniform_1vN.argtypes = [p64, i64, p64, p64, i64, p64]
            lib.rf_indel_1vN.restype = None
            lib.rf_indel_1vN.argtypes = [p64, i64, p64, p64, i64, p64]
            lib.rf_levenshtein_uniform_bp.restype = i64
            lib.rf_levenshtein_uniform_bp.argtypes = [p64, i64, p64, i64, i64]
            lib.rf_lcs_seq_bp.restype = i64
            lib.rf_lcs_seq_bp.argtypes = [p64, i64, p64, i64]
            lib.rf_indel_bp.restype = i64
            lib.rf_indel_bp.argtypes = [p64, i64, p64, i64]
            lib.rf_osa_bp.restype = i64
            lib.rf_osa_bp.argtypes = [p64, i64, p64, i64]
            _lib = lib
    return _lib


#: above this len1*len2 product the bit-parallel u64 kernels beat the
#: textbook row DP (PM-table setup amortizes); below it the quadratic
#: third-opinion code is cheapest and battle-tested
_BP_MIN_CELLS = 64

_SCALAR_SRC = os.path.join(_ROOT, "native", "rf_scalar.cpp")
_SCALAR_SO = os.path.join(_HERE, "_rf_scalar.so")
_fast = None
_fast_tried = False


def fast_scalar():
    """The ``_rf_scalar`` CPython extension (one-shot str/bytes fast path,
    ~0.3-2 us/call vs ~20-60 us through the numpy/ctypes route), built on
    first use next to the package.  Returns None if the build fails —
    callers fall back to the general encoder path.
    """
    global _fast, _fast_tried
    if _fast_tried:
        return _fast
    with _lock:
        if _fast_tried:
            return _fast
        try:
            import importlib.util
            import sysconfig

            fresh = (os.path.exists(_SCALAR_SO)
                     and os.path.getmtime(_SCALAR_SO)
                     >= max(os.path.getmtime(_SCALAR_SRC),
                            os.path.getmtime(_SRC)))
            if not fresh:
                cmd = ["g++", "-O2", "-march=native", "-ffp-contract=off",
                       "-shared", "-fPIC",
                       "-I" + sysconfig.get_path("include"),
                       "-I" + os.path.dirname(_SCALAR_SRC),
                       "-o", _SCALAR_SO + ".tmp", _SCALAR_SRC]
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(_SCALAR_SO + ".tmp", _SCALAR_SO)
            spec = importlib.util.spec_from_file_location("_rf_scalar",
                                                          _SCALAR_SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _fast = mod
        except Exception:
            _fast = None
        _fast_tried = True
    return _fast


def _arr(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def levenshtein_uniform(a, b) -> int:
    a, b = _arr(a), _arr(b)
    return int(_load().rf_levenshtein_uniform(a, a.size, b, b.size))


def levenshtein_uniform_banded(a, b) -> int:
    """Exact uniform Levenshtein via Ukkonen band doubling (long strings)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_levenshtein_uniform_banded(a, a.size, b, b.size))


def levenshtein_weighted(a, b, ins: int, dele: int, sub: int) -> int:
    a, b = _arr(a), _arr(b)
    return int(_load().rf_levenshtein_weighted(a, a.size, b, b.size, ins, dele, sub))


def lcs_seq(a, b) -> int:
    a, b = _arr(a), _arr(b)
    if a.size * b.size > _BP_MIN_CELLS:
        return int(_load().rf_lcs_seq_bp(a, a.size, b, b.size))
    return int(_load().rf_lcs_seq(a, a.size, b, b.size))


def lcs_seq_dp(a, b) -> int:
    """Quadratic textbook LCS (third opinion vs the bit-parallel path)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_lcs_seq(a, a.size, b, b.size))


def lcs_seq_bp(a, b) -> int:
    """Hyyro u64 bit-parallel LCS, O(ceil(N/64)*M) (lcs_seq.rs:199-261)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_lcs_seq_bp(a, a.size, b, b.size))


def indel(a, b) -> int:
    a, b = _arr(a), _arr(b)
    if a.size * b.size > _BP_MIN_CELLS:
        return int(_load().rf_indel_bp(a, a.size, b, b.size))
    return int(_load().rf_indel(a, a.size, b, b.size))


def indel_dp(a, b) -> int:
    """Quadratic textbook indel (third opinion vs the bit-parallel path)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_indel(a, a.size, b, b.size))


def osa(a, b) -> int:
    a, b = _arr(a), _arr(b)
    if a.size * b.size > _BP_MIN_CELLS:
        return int(_load().rf_osa_bp(a, a.size, b, b.size))
    return int(_load().rf_osa(a, a.size, b, b.size))


def osa_dp(a, b) -> int:
    """Quadratic textbook OSA (third opinion vs the bit-parallel path)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_osa(a, a.size, b, b.size))


def osa_bp(a, b) -> int:
    """Hyyro u64 bit-parallel OSA, O(ceil(N/64)*M) (osa.rs:84-227)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_osa_bp(a, a.size, b, b.size))


def levenshtein_uniform_bp(a, b, cutoff: int = -1) -> int:
    """Myers/Hyyro u64 blockwise uniform Levenshtein.

    ``cutoff >= 0``: Ukkonen-banded in word blocks, O(ceil(K/64)*M) —
    exact when the distance <= cutoff, else returns ``cutoff + 1``
    (``levenshtein.rs:48-49`` asymptotics).  ``cutoff < 0``: full exact.
    """
    a, b = _arr(a), _arr(b)
    return int(_load().rf_levenshtein_uniform_bp(a, a.size, b, b.size,
                                                 int(cutoff)))


def levenshtein_uniform_auto(a, b, cutoff=None, hint=None) -> int:
    """Uniform Levenshtein with the reference's one-shot routing
    (``levenshtein.rs:1104-1222``): tiny pairs on the quadratic DP, a
    caller cutoff bounds the band directly, a ``score_hint`` seeds a
    geometric band ladder (exactness never depends on the hint).

    Returns the exact distance when it is <= the effective cutoff, else
    any value > cutoff (callers mask).
    """
    a, b = _arr(a), _arr(b)
    m, n = a.size, b.size
    lib = _load()
    if m * n <= _BP_MIN_CELLS:
        d = int(lib.rf_levenshtein_uniform(a, m, b, n))
        return d if cutoff is None or d <= cutoff else int(cutoff) + 1
    if cutoff is not None and (hint is None or hint >= cutoff):
        return int(lib.rf_levenshtein_uniform_bp(a, m, b, n, int(cutoff)))
    if cutoff is None and hint is None and max(m, n) <= 512:
        # short pairs: one full blockwise pass beats the band ladder
        return int(lib.rf_levenshtein_uniform_bp(a, m, b, n, -1))
    k = max(int(hint) if hint is not None else 64, abs(m - n), 16)
    lim = max(m, n)
    while True:
        if cutoff is not None:
            k = min(k, int(cutoff))
        r = int(lib.rf_levenshtein_uniform_bp(a, m, b, n, int(k)))
        if r <= k or k >= lim or (cutoff is not None and k >= cutoff):
            return r
        k = min(k * 4, lim)


def damerau(a, b) -> int:
    a, b = _arr(a), _arr(b)
    return int(_load().rf_damerau(a, a.size, b, b.size))


def damerau_rows(a, b) -> int:
    """Rolling-row Lowrance-Wagner (O((sigma+3)*M) memory — the long-input
    route inside rf_damerau, exported for conformance tests)."""
    a, b = _arr(a), _arr(b)
    return int(_load().rf_damerau_rows(a, a.size, b, b.size))


def hamming(a, b) -> int:
    a, b = _arr(a), _arr(b)
    return int(_load().rf_hamming(a, a.size, b, b.size))


def prefix_sim(a, b) -> int:
    a, b = _arr(a), _arr(b)
    return int(_load().rf_prefix_sim(a, a.size, b, b.size))


def postfix_sim(a, b) -> int:
    a, b = _arr(a), _arr(b)
    return int(_load().rf_postfix_sim(a, a.size, b, b.size))


def partial_ratio(a, b) -> float:
    """Brute-force best-window indel ratio (independent of the library's
    batched host sweep — the window kernel's conformance reference)."""
    a, b = _arr(a), _arr(b)
    return float(_load().rf_partial_ratio(a, a.size, b, b.size))


def jaro(a, b) -> float:
    a, b = _arr(a), _arr(b)
    return float(_load().rf_jaro(a, a.size, b, b.size))


def jaro_winkler(a, b, prefix_weight: float = 0.1) -> float:
    a, b = _arr(a), _arr(b)
    return float(_load().rf_jaro_winkler(a, a.size, b, b.size, prefix_weight))


def levenshtein_uniform_1vN(q, flat, offsets) -> np.ndarray:
    q, flat, offsets = _arr(q), _arr(flat), _arr(offsets)
    n = offsets.size - 1
    out = np.empty(n, np.int64)
    _load().rf_levenshtein_uniform_1vN(q, q.size, flat, offsets, n, out)
    return out


def indel_1vN(q, flat, offsets) -> np.ndarray:
    q, flat, offsets = _arr(q), _arr(flat), _arr(offsets)
    n = offsets.size - 1
    out = np.empty(n, np.int64)
    _load().rf_indel_1vN(q, q.size, flat, offsets, n, out)
    return out
