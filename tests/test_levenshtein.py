"""Levenshtein conformance tests.

Mirrors the reference test strategy (SURVEY.md §4): golden cases ported
from ``/root/reference/src/distance/levenshtein.rs:1820-2170``, metamorphic
checks (symmetry, batch == scalar), cutoff ladders, and a randomized
device-vs-oracle sweep across kernel-route-forcing lengths.
"""

import numpy as np
import pytest

from rapidfuzz_tpu.distance import levenshtein as lev
from rapidfuzz_tpu import oracle

W12 = lev.WeightTable(1, 1, 2)


def both(s1, s2, **kw):
    """distance computed both directions + batch path; all must agree."""
    r1 = lev.distance(s1, s2, **kw)
    r2 = lev.distance(s2, s1, **kw)
    assert r1 == r2
    weights = kw.get("weights", lev.WeightTable())
    cut = kw.get("score_cutoff")
    b = lev.distance_many([s1], [s2], weights=weights, score_cutoff=cut).tolist()[0]
    b2 = lev.distance_many([s2], [s1], weights=weights, score_cutoff=cut).tolist()[0]
    assert b == r1, (s1, s2, kw, b, r1)
    assert b2 == r1
    return r1


# golden cases from levenshtein.rs:1932-1977 (empty/simple)
def test_empty():
    assert both("", "") == 0
    assert both("aaaa", "") == 4


def test_simple():
    assert both("aaaa", "aaaa") == 0
    assert both("aaaa", "aaa") == 1
    assert both("aaaa", "aaab") == 1
    assert both("abaa", "baaa") == 2
    assert both("aaaa", "bbbb") == 4
    assert lev.normalized_similarity("aaaa", "aaaa") == pytest.approx(1.0)
    assert lev.normalized_similarity("aaaa", "aaa") == pytest.approx(0.75)
    assert lev.normalized_similarity("abaa", "baaa") == pytest.approx(0.5)
    assert lev.normalized_similarity("aaaa", "bbbb") == pytest.approx(0.0)


# levenshtein.rs:1980-2020
def test_weighted_simple():
    assert both("aaaa", "aaaa", weights=W12) == 0
    assert both("aaaa", "aaa", weights=W12) == 1
    assert both("abaa", "baaa", weights=W12) == 2
    assert both("aaaa", "aaab", weights=W12) == 2
    assert both("aaaa", "bbbb", weights=W12) == 8
    assert lev.normalized_similarity("aaaa", "aaa", weights=W12) == pytest.approx(0.8571, abs=1e-4)
    assert lev.normalized_similarity("abaa", "baaa", weights=W12) == pytest.approx(0.75)


# levenshtein.rs:2023-2066 (cutoff ladder)
def test_mbleven_ladder():
    a, b = "South Korea", "North Korea"
    assert both(a, b) == 2
    assert both(a, b, score_cutoff=4) == 2
    assert both(a, b, score_cutoff=3) == 2
    assert both(a, b, score_cutoff=2) == 2
    assert both(a, b, score_cutoff=1) is None
    assert both(a, b, score_cutoff=0) is None

    assert both(a, b, weights=W12) == 4
    assert both(a, b, weights=W12, score_cutoff=4) == 4
    assert both(a, b, weights=W12, score_cutoff=3) is None

    a, b = "aabc", "cccd"
    assert both(a, b) == 4
    assert both(a, b, score_cutoff=4) == 4
    assert both(a, b, score_cutoff=3) is None
    assert both(a, b, weights=W12) == 6
    assert both(a, b, weights=W12, score_cutoff=6) == 6
    assert both(a, b, weights=W12, score_cutoff=5) is None


# levenshtein.rs:2069-2130 (banded routes in the reference; one kernel here)
BANDED_CASES = [
    ("kkkkbbbbfkkkkkkibfkkkafakkfekgkkkkkkkkkkbdbbddddddddddafkkkekkkhkk",
     "khddddddddkkkkdgkdikkccccckcckkkekkkkdddddddddddafkkhckkkkkdckkkcc", 36),
    ("ccddcddddddddddddddddddddddddddddddddddddddddddddddddddddaaaaaaaaaaa",
     "aaaaaaaaaaaaaadddddddddbddddddddddddddddddddddddddddddddddbddddddddd", 26),
    ("a" * 128, "b" * 128, 128),
]


@pytest.mark.parametrize("s1,s2,expected", BANDED_CASES)
def test_banded(s1, s2, expected):
    assert both(s1, s2) == expected
    assert both(s1, s2, score_cutoff=expected) == expected
    assert both(s1, s2, score_cutoff=expected - 1) is None


# levenshtein.rs:2163-2169
def test_unicode():
    assert both("Иванко", "Петрунко") == 5


def test_similarity():
    # maximum = max(len) for uniform weights
    assert lev.similarity("kitten", "sitting") == 7 - 3
    assert lev.similarity("kitten", "sitting", score_cutoff=5) is None
    assert lev.similarity("kitten", "sitting", score_cutoff=4) == 4


def test_random_sweep_vs_oracle(rng):
    lens = [0, 1, 2, 3, 5, 8, 31, 32, 33, 63, 64, 65, 127, 128, 129]
    pairs = []
    for _ in range(150):
        l1, l2 = rng.choice(lens), rng.choice(lens)
        k = int(rng.choice([2, 4, 26]))
        s1 = "".join(chr(97 + c) for c in rng.integers(0, k, l1))
        s2 = "".join(chr(97 + c) for c in rng.integers(0, k, l2))
        pairs.append((s1, s2))
    got = lev.distance_many([p[0] for p in pairs], [p[1] for p in pairs]).values
    for (s1, s2), g in zip(pairs, got):
        exp = oracle.levenshtein_uniform(
            np.frombuffer(s1.encode("utf-32-le"), np.uint32).astype(np.int64),
            np.frombuffer(s2.encode("utf-32-le"), np.uint32).astype(np.int64))
        assert g == exp, (s1, s2, g, exp)


def test_random_weighted_vs_oracle(rng):
    weights = [(1, 1, 1), (1, 1, 2), (2, 2, 5), (1, 2, 3), (3, 2, 1), (0, 0, 1)]
    for ins, dele, sub in weights:
        w = lev.WeightTable(ins, dele, sub)
        pairs = []
        for _ in range(40):
            l1, l2 = rng.integers(0, 40), rng.integers(0, 40)
            s1 = "".join(chr(97 + c) for c in rng.integers(0, 4, l1))
            s2 = "".join(chr(97 + c) for c in rng.integers(0, 4, l2))
            pairs.append((s1, s2))
        got = lev.distance_many([p[0] for p in pairs], [p[1] for p in pairs],
                                weights=w).values
        for (s1, s2), g in zip(pairs, got):
            u1 = np.frombuffer(s1.encode("utf-32-le"), np.uint32).astype(np.int64) if s1 else np.empty(0, np.int64)
            u2 = np.frombuffer(s2.encode("utf-32-le"), np.uint32).astype(np.int64) if s2 else np.empty(0, np.int64)
            exp = oracle.levenshtein_weighted(u1, u2, ins, dele, sub)
            if ins == dele == 0:
                exp = 0
            assert g == exp, (s1, s2, (ins, dele, sub), g, exp)


def test_batch_comparator_matches_scalar(rng):
    q = "qwertzuiopasdfghjkl"
    corpus = ["qwertzuiopa", "qwertzuiopasdfghjkl", "x", "",
              "qwartzuiopasdfghjkl", "llkjhgfdsapoiuztrewq"]
    bc = lev.BatchComparator(q)
    got = bc.distances(corpus).values
    for s, g in zip(corpus, got):
        assert g == lev.distance(q, s)
        assert bc.distance(s) == lev.distance(q, s)


def test_huge_weight_costs_no_overflow():
    """Regression: the int32 device DP must not silently wrap for large
    cost tables — the batch path falls back to the int64 oracle."""
    w = lev.WeightTable(2 * 10 ** 7, 2 * 10 ** 7, 3 * 10 ** 7)
    s1, s2 = "a" * 300, "b" * 300
    exp = lev.distance(s1, s2, weights=w)
    assert exp == 9_000_000_000
    assert lev.distance_many([s1], [s2], weights=w).values[0] == exp


def test_uint64_overflow_values():
    """Regression: u64 values above int64 are bit-cast (equality
    preserved) instead of raising OverflowError."""
    big = 2 ** 64 - 1
    a = np.array([big, 5], np.uint64)
    b = np.array([big, 6], np.uint64)
    assert lev.distance(a, b) == 1
    assert lev.distance_many([a], [b]).values[0] == 1
    assert lev.distance([big, 5], [big, 5]) == 0   # python ints > 2**63


def test_int_sequences():
    assert lev.distance([1, 2, 3], [1, 2, 4]) == 1
    assert lev.distance(b"kitten", b"sitting") == 3
    # large ints force vocab remap on the batch path
    big = 2 ** 40
    r = lev.distance_many([[big, big + 1]], [[big, big + 2]]).values
    assert r[0] == 1
    assert lev.distance([big, big + 1], [big, big + 2]) == 1
