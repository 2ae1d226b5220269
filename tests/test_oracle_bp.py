"""Conformance tests for the host bit-parallel oracle kernels.

The u64 blockwise kernels in ``native/oracle.cpp`` (Myers/Hyyro uniform
Levenshtein with Ukkonen band, Hyyro LCS, Hyyro OSA — the reference's
one-shot asymptotics, ``levenshtein.rs:48-49``, ``lcs_seq.rs:18-19``,
``osa.rs:29-30``) are verified against the quadratic textbook DP, which is
the independent third opinion.
"""

import numpy as np
import pytest

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.distance import levenshtein


def _rand_pair(rng, max_len, sigma):
    n1 = int(rng.integers(0, max_len + 1))
    n2 = int(rng.integers(0, max_len + 1))
    a = rng.integers(0, sigma, n1).astype(np.int64)
    b = rng.integers(0, sigma, n2).astype(np.int64)
    return a, b


@pytest.mark.parametrize("sigma", [2, 4, 26, 1 << 40])
def test_bp_matches_dp_random(rng, sigma):
    for _ in range(120):
        a, b = _rand_pair(rng, 300, sigma)
        assert oracle.lcs_seq_bp(a, b) == oracle.lcs_seq_dp(a, b)
        assert oracle.osa_bp(a, b) == oracle.osa_dp(a, b)
        want = oracle.levenshtein_uniform(a, b)
        assert oracle.levenshtein_uniform_bp(a, b, -1) == want


def test_bp_lev_cutoff_contract(rng):
    """Exact when <= cutoff, anything > cutoff otherwise."""
    for _ in range(150):
        a, b = _rand_pair(rng, 260, int(rng.choice([2, 8, 50])))
        want = oracle.levenshtein_uniform(a, b)
        for k in [0, 1, 3, want - 1, want, want + 1, want + 17]:
            if k < 0:
                continue
            got = oracle.levenshtein_uniform_bp(a, b, k)
            if want <= k:
                assert got == want, (a.tolist(), b.tolist(), k)
            else:
                assert got > k, (a.tolist(), b.tolist(), k)


def test_bp_auto_hint_ladder_exact(rng):
    """The hint seeds the band but never changes the result."""
    for _ in range(60):
        a, b = _rand_pair(rng, 400, 4)
        want = oracle.levenshtein_uniform(a, b)
        for hint in [0, 1, want // 2, want, want * 2 + 5]:
            got = oracle.levenshtein_uniform_auto(a, b, hint=hint)
            assert got == want
        # cutoff + hint combined
        got = oracle.levenshtein_uniform_auto(a, b, cutoff=want, hint=0)
        assert got == want


def test_bp_multichunk(rng):
    """Patterns above one 8192-row chunk exercise the boundary streams."""
    m = 17_000
    a = rng.integers(0, 30, m).astype(np.int64)
    b = a.copy().tolist()
    for _ in range(200):
        op = int(rng.integers(0, 3))
        pos = int(rng.integers(0, len(b)))
        if op == 0:
            b[pos] = int(rng.integers(0, 30))
        elif op == 1 and len(b) > 1:
            del b[pos]
        else:
            b.insert(pos, int(rng.integers(0, 30)))
    b = np.asarray(b, np.int64)
    full = oracle.levenshtein_uniform_bp(a, b, -1)
    assert full <= 200
    assert oracle.levenshtein_uniform_bp(a, b, full) == full
    assert oracle.levenshtein_uniform_bp(a, b, max(full - 1, 0)) > full - 1
    # LCS/OSA multichunk vs the banded-DP-free relations
    lcs = oracle.lcs_seq_bp(a, b)
    assert a.size + b.size - 2 * lcs == oracle.indel(a, b)
    assert oracle.osa_bp(a, b) <= full


def test_ocr_pair_host_one_shot():
    """The reference's long-sequence fixture (levenshtein.rs:2139-2161):
    distance 5278; cutoff 2500 -> None; score_hint 0 stays exact.  All on
    the host bit-parallel path in well under a second each."""
    d = np.load("tests/fixtures/ocr.npz")
    a, b = d["ex1"].astype(np.int64), d["ex2"].astype(np.int64)
    assert oracle.levenshtein_uniform_auto(a, b) == 5278
    assert oracle.levenshtein_uniform_auto(a, b, cutoff=2500) > 2500
    assert oracle.levenshtein_uniform_auto(a, b, hint=0) == 5278
    assert levenshtein.distance(a, b, score_cutoff=2500) is None
    assert levenshtein.distance(a, b, score_cutoff=5278) == 5278
    assert levenshtein.distance(a, b, score_hint=0) == 5278


def test_scalar_cutoff_semantics_vs_uncut(rng):
    """Public scalar functions: a cutoff only masks, never changes the
    surviving value — across all four score kinds."""
    for _ in range(40):
        a, b = _rand_pair(rng, 250, 6)
        d = levenshtein.distance(a, b)
        mx = levenshtein.maximum(a.size, b.size)
        s = levenshtein.similarity(a, b)
        for k in [0, d // 2, d, d + 3]:
            got = levenshtein.distance(a, b, score_cutoff=k)
            assert got == (d if d <= k else None)
        for k in [0, s // 2, s, s + 3, mx]:
            got = levenshtein.similarity(a, b, score_cutoff=k)
            assert got == (s if s >= k else None)
        if mx:
            nd = levenshtein.normalized_distance(a, b)
            for c in [0.0, nd / 2, nd, min(nd + 0.1, 1.0), 1.0]:
                got = levenshtein.normalized_distance(a, b, score_cutoff=c)
                assert got == (nd if nd <= c else None)
            ns = levenshtein.normalized_similarity(a, b)
            for c in [0.0, ns / 2, ns, min(ns + 0.1, 1.0), 1.0]:
                got = levenshtein.normalized_similarity(a, b, score_cutoff=c)
                assert got == (ns if ns >= c else None)


def test_bp_empty_and_affix_edges():
    e = np.array([], np.int64)
    x = np.array([1, 2, 3], np.int64)
    assert oracle.levenshtein_uniform_bp(e, e, -1) == 0
    assert oracle.levenshtein_uniform_bp(e, x, -1) == 3
    assert oracle.levenshtein_uniform_bp(x, e, 2) > 2
    assert oracle.lcs_seq_bp(x, x) == 3
    assert oracle.osa_bp(x, x[::-1].copy()) == 2
    # affix stripping: big equal outer shell, one inner edit
    a = np.r_[np.arange(100), 7, np.arange(100)].astype(np.int64)
    b = np.r_[np.arange(100), 9, np.arange(100)].astype(np.int64)
    assert oracle.levenshtein_uniform_bp(a, b, 1) == 1
    assert oracle.osa_bp(a, b) == 1
    assert oracle.lcs_seq_bp(a, b) == 200


def test_damerau_rows_matches_full_matrix(rng):
    """The rolling-row Damerau (long-input route, O((sigma+3)*M) memory)
    is exact vs the full Lowrance-Wagner matrix, including transposition
    chains and repeated symbols."""
    for _ in range(250):
        sigma = int(rng.choice([2, 4, 26]))
        n1 = int(rng.integers(0, 90))
        n2 = int(rng.integers(0, 90))
        a = rng.integers(0, sigma, n1).astype(np.int64)
        b = rng.integers(0, sigma, n2).astype(np.int64)
        assert oracle.damerau_rows(a, b) == oracle.damerau(a, b)
