"""The in-process C scalar fast path (native/rf_scalar.cpp) must be
bit-identical to the numpy-encoder oracle route for every metric,
across unicode planes, bytes, cutoffs, hints, and weights."""

import numpy as np
import pytest

from rapidfuzz_tpu import fuzz, oracle
from rapidfuzz_tpu.distance import (damerau_levenshtein, hamming, indel,
                                    jaro, jaro_winkler, lcs_seq,
                                    levenshtein, osa, postfix, prefix)
from rapidfuzz_tpu.utils import codec


def _rand_str(rng, n, plane):
    if plane == "ascii":
        return "".join(chr(97 + int(rng.integers(0, 26))) for _ in range(n))
    if plane == "bmp":
        return "".join(chr(int(rng.integers(0x400, 0x4FF)))
                       for _ in range(n))
    return "".join(chr(int(rng.integers(0x10000, 0x10200)))
                   for _ in range(n))


def test_fast_scalar_available():
    assert oracle.fast_scalar() is not None


@pytest.mark.parametrize("plane", ["ascii", "bmp", "astral"])
def test_fast_matches_encoder_route(rng, plane):
    fast = oracle.fast_scalar()
    assert fast is not None
    for _ in range(60):
        s1 = _rand_str(rng, int(rng.integers(0, 90)), plane)
        s2 = _rand_str(rng, int(rng.integers(0, 90)), plane)
        u1, u2 = codec.encode_one(s1), codec.encode_one(s2)
        assert fast.lev_uniform(s1, s2, -1, -1) \
            == oracle.levenshtein_uniform(u1, u2)
        assert fast.int_metric(0, s1, s2) == oracle.indel(u1, u2)
        assert fast.int_metric(1, s1, s2) == oracle.lcs_seq(u1, u2)
        assert fast.int_metric(2, s1, s2) == oracle.osa(u1, u2)
        assert fast.int_metric(3, s1, s2) == oracle.damerau(u1, u2)
        assert fast.int_metric(4, s1, s2) == oracle.hamming(u1, u2)
        assert fast.int_metric(5, s1, s2) == oracle.prefix_sim(u1, u2)
        assert fast.int_metric(6, s1, s2) == oracle.postfix_sim(u1, u2)
        assert fast.jaro(s1, s2) == oracle.jaro(u1, u2)
        assert fast.jaro_winkler(s1, s2, 0.1) \
            == oracle.jaro_winkler(u1, u2, 0.1)
        assert fast.lev_weighted(s1, s2, 1, 2, 3) \
            == oracle.levenshtein_weighted(u1, u2, 1, 2, 3)


def test_public_api_str_vs_array_inputs(rng):
    """The public functions give the same answer whether the pair comes
    in as str (C fast path) or as the encoded arrays (numpy route)."""
    mods = [(levenshtein, "distance"), (indel, "distance"),
            (lcs_seq, "distance"), (osa, "distance"),
            (damerau_levenshtein, "distance"), (prefix, "similarity"),
            (postfix, "similarity"), (jaro, "similarity"),
            (jaro_winkler, "similarity")]
    for _ in range(30):
        s1 = _rand_str(rng, int(rng.integers(0, 60)), "ascii")
        s2 = _rand_str(rng, int(rng.integers(0, 60)), "bmp" if
                       rng.integers(0, 2) else "ascii")
        u1, u2 = codec.encode_one(s1), codec.encode_one(s2)
        for mod, fn in mods:
            a = getattr(mod, fn)(s1, s2)
            b = getattr(mod, fn)(u1, u2)
            assert a == b, (mod.__name__, fn, s1, s2, a, b)
        assert fuzz.ratio(s1, s2) == fuzz.ratio(u1, u2)
        # cutoff/hint/weights agreement on the levenshtein surface
        d = levenshtein.distance(s1, s2)
        for cut in (0, d // 2, d, d + 2):
            assert levenshtein.distance(s1, s2, score_cutoff=cut) \
                == levenshtein.distance(u1, u2, score_cutoff=cut)
        for hint in (0, d, 2 * d + 1):
            assert levenshtein.distance(s1, s2, score_hint=hint) == d
        w = levenshtein.WeightTable(2, 1, 3)
        assert levenshtein.distance(s1, s2, weights=w) \
            == levenshtein.distance(u1, u2, weights=w)
        assert levenshtein.similarity(s1, s2, weights=w) \
            == levenshtein.similarity(u1, u2, weights=w)


def test_fast_scalar_edge_inputs():
    fast = oracle.fast_scalar()
    assert fast.lev_uniform("", "", -1, -1) == 0
    assert fast.lev_uniform("", "abc", -1, -1) == 3
    assert fast.lev_uniform("abc", b"abc", -1, -1) == 0    # str == bytes
    assert fast.int_metric(4, "a\x00b", "a\x00b") == 0     # NUL-safe
    assert fast.lev_uniform([1, 2], "ab", -1, -1) is None  # fallback
    big = "x" * 3000
    assert fast.lev_uniform(big, big[:-5] + "yyyyy", -1, -1) == 5
    # hamming via the module keeps the strict length contract
    with pytest.raises(hamming.DifferentLengthArgsError):
        hamming.distance("ab", "abc")
    assert hamming.distance("ab", "abc", pad=True) == 1


def test_mbleven_tiny_cutoff_exact(rng):
    """cutoff < 4 rides the generated-script mbleven walk
    (levenshtein.rs:324-427,1142-1144): exact whenever the true distance
    is <= k, always > k otherwise — checked against the quadratic DP
    over random and near-identical pairs at short and long lengths."""
    for trial in range(300):
        m = int(rng.integers(0, 200))
        a = rng.integers(97, 102, m).astype(np.int64)
        if trial % 2:
            b = rng.integers(97, 102, int(rng.integers(0, 200))).astype(
                np.int64)
        else:                       # near-identical: distance often <= 3
            b = list(a)
            for _ in range(int(rng.integers(0, 4))):
                op = int(rng.integers(0, 3))
                p = int(rng.integers(0, max(1, len(b))))
                if op == 0 and b:
                    b[p % len(b)] = int(rng.integers(97, 102))
                elif op == 1 and b:
                    del b[p % len(b)]
                else:
                    b.insert(p, int(rng.integers(97, 102)))
            b = np.array(b, np.int64)
        true = oracle.levenshtein_uniform(a, b)
        for k in (0, 1, 2, 3):
            got = oracle.levenshtein_uniform_bp(a, b, k)
            if true <= k:
                assert got == true, (m, k, got, true)
            else:
                assert got > k, (m, k, got, true)


def test_indel_lcs_mbleven_tiny_cutoff(rng):
    """Indel/LCS one-shots under a tiny miss budget ride the del/ins-only
    op-script walk (lcs_seq.rs:488-532, table :113-133) through the C
    vectorcall path: exact results and None-masking must match the full
    bit-parallel route across all four score kinds."""
    from rapidfuzz_tpu.distance import indel, lcs_seq

    for trial in range(400):
        m = int(rng.integers(0, 60))
        a = "".join(chr(97 + int(c)) for c in rng.integers(0, 5, m))
        b = list(a)
        for _ in range(int(rng.integers(0, 6))):
            op = int(rng.integers(0, 3))
            p = int(rng.integers(0, max(1, len(b))))
            if op == 0 and b:
                b[p % len(b)] = chr(97 + int(rng.integers(0, 5)))
            elif op == 1 and b:
                del b[p % len(b)]
            else:
                b.insert(p, chr(97 + int(rng.integers(0, 5)))
                         )
        b = "".join(b)
        ae = np.array([ord(c) for c in a], np.int64)
        be = np.array([ord(c) for c in b], np.int64)
        di = int(oracle.indel(ae, be))
        lcs = (len(a) + len(b) - di) // 2
        mx = max(len(a), len(b))
        tot = len(a) + len(b)
        dl = mx - lcs
        for k in (0, 1, 2, 3, 4):
            g = indel.distance(a, b, score_cutoff=k)
            assert g == (di if di <= k else None), (a, b, k, g, di)
            g = lcs_seq.distance(a, b, score_cutoff=k)
            assert g == (dl if dl <= k else None), (a, b, k, g, dl)
        for cut in (lcs - 1, lcs, lcs + 1, max(tot // 2 - 1, 0)):
            g = lcs_seq.similarity(a, b, score_cutoff=cut)
            assert g == (lcs if lcs >= cut else None), (a, b, cut, g)
            si = tot - di
            g = indel.similarity(a, b, score_cutoff=cut)
            assert g == (si if si >= cut else None), (a, b, cut, g)
        nd = di / tot if tot else 0.0
        ndl = dl / mx if mx else 0.0
        for cut in (0.0, 0.02, 0.1, nd, ndl):
            g = indel.normalized_distance(a, b, score_cutoff=cut)
            exp = nd if nd <= cut else None
            assert (g is None) == (exp is None) and \
                (g is None or abs(g - exp) < 1e-12), (a, b, cut, g, exp)
            g = lcs_seq.normalized_distance(a, b, score_cutoff=cut)
            exp = ndl if ndl <= cut else None
            assert (g is None) == (exp is None) and \
                (g is None or abs(g - exp) < 1e-12), (a, b, cut, g, exp)


def test_u8_lane_vs_encoder_route(rng):
    """The raw str(kind-1)/bytes u8 lane (2-word __int128 kernels,
    pm_clear) returns exactly what the int64 encoder route returns,
    including 64 < m <= 128 and long-text (n >= 256) shapes."""
    fast = oracle.fast_scalar()
    if fast is None:
        pytest.skip("no C extension")
    for trial in range(200):
        m = int(rng.integers(0, 150))
        n = int(rng.integers(0, 320))
        a = "".join(chr(int(c)) for c in rng.integers(97, 105, m))
        b = "".join(chr(int(c)) for c in rng.integers(97, 105, n))
        u1 = np.array([ord(c) for c in a], np.int64)
        u2 = np.array([ord(c) for c in b], np.int64)
        assert fast.lev_uniform(a, b, -1, -1) \
            == oracle.levenshtein_uniform(u1, u2)
        assert fast.int_metric(1, a, b) == oracle.lcs_seq_dp(u1, u2)
        assert fast.int_metric(0, a, b) == oracle.indel_dp(u1, u2)
        assert fast.int_metric(2, a, b) == oracle.osa_dp(u1, u2)


def test_c_vectorcall_semantics():
    """The FastMetric C callables bound to the public names keep the
    exact wrapper semantics: cutoff algebra per kind, None returns,
    keyword handling (score_hint ignored, unknown keywords fall back),
    float/int cutoffs, and fallback classes (wide unicode, arrays,
    exotic cutoff types)."""
    import fractions

    from rapidfuzz_tpu import fuzz
    from rapidfuzz_tpu.distance import (indel, jaro, jaro_winkler,
                                        levenshtein)

    assert indel.distance("kitten", "sitting") == 5
    assert indel.distance("kitten", "sitting", score_cutoff=4) is None
    assert indel.distance("kitten", "sitting", score_cutoff=5) == 5
    assert indel.distance("kitten", "sitting", score_hint=1) == 5
    assert indel.similarity("abcd", "abcd") == 8
    assert indel.normalized_similarity("", "") == 1.0
    assert indel.normalized_distance("", "") == 0.0
    assert isinstance(indel.normalized_distance("ab", "cd"), float)
    # exotic cutoff types take the Python path, same answers
    assert indel.distance("ab", "cd",
                          score_cutoff=fractions.Fraction(4, 1)) == 4
    # non-str/wide inputs fall back
    assert indel.distance([1, 2, 3], [1, 2, 4]) == 2
    assert indel.distance("Иванко", "Иванкоа") == 1
    # float cutoffs on integer metrics compare like Python
    assert levenshtein.distance("abc", "abd", score_cutoff=0.5) is None
    assert levenshtein.distance("abc", "abc", score_cutoff=0.5) == 0
    # negative cutoff: every distance > it
    assert levenshtein.distance("abc", "abc", score_cutoff=-1) is None
    # jaro family floats + prefix_weight keyword
    assert jaro.similarity("abc", "abc") == 1.0
    assert jaro_winkler.similarity(
        "martha", "marhta", prefix_weight=0.2) != jaro_winkler.similarity(
        "martha", "marhta")
    # fuzz.ratio: processor keyword falls back, C path otherwise
    assert fuzz.ratio("this is a test", "THIS is a TEST!",
                      processor=fuzz.default_process) == 1.0
    assert round(fuzz.ratio("this is a test", "this is a test!"), 4) \
        == 0.9655
    # doc attrs survive the C binding (doctest relies on __test__)
    assert "distance" in indel.distance.__name__
    assert indel.distance.__doc__


def test_c_vectorcall_backend_env(monkeypatch):
    """RAPIDFUZZ_TPU_SCALAR_BACKEND=device bypasses the C fast path in
    the C callable itself (getenv check) — results still correct via the
    fallback closures."""
    from rapidfuzz_tpu.distance import indel
    monkeypatch.setenv("RAPIDFUZZ_TPU_SCALAR_BACKEND", "cpp")
    assert indel.distance("kitten", "sitting") == 5
    monkeypatch.delenv("RAPIDFUZZ_TPU_SCALAR_BACKEND")
    assert indel.distance("kitten", "sitting") == 5
