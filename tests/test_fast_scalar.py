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
