"""Interpret-mode conformance of the Pallas one-vs-many kernels.

The TPU kernels (``rapidfuzz_tpu/ops/pallas``) are exercised on CPU via
``interpret=True`` against the C++ oracle — same metamorphic idea as the
reference's route-targeted unit tests (``levenshtein.rs:2069-2137``): pick
shapes that force each word-count / table-mode configuration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
from rapidfuzz_tpu.ops.pallas import lcs_kernel as ck
from rapidfuzz_tpu.ops.pallas import osa_kernel as ok

B = 4096  # one grid cell (SUB * LANE)


def _mk(rng, n, lo, hi, LB):
    """Random corpus with ragged lengths in [0, LB]."""
    lens = rng.integers(0, LB + 1, n).astype(np.int32)
    lens[0] = 0
    lens[1] = LB
    chars = rng.integers(lo, hi, (n, LB)).astype(np.int32)
    for i, l in enumerate(lens):
        chars[i, l:] = -1  # PAD
    return chars, lens


def _run_case(qlen, LB, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    query = rng.integers(lo, hi, qlen).astype(np.int32)
    chars, lens = _mk(rng, B, lo, hi, LB)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    mode = lk.pick_mode(query, int(chars.max()) if chars.size else 0)

    lev = np.asarray(lk.lev_1v_many(query, cand3, lb2, mode=mode,
                                    interpret=True)).reshape(-1)
    lcs = np.asarray(ck.lcs_1v_many(query, cand3, lb2, mode=mode,
                                    interpret=True)).reshape(-1)
    osa = np.asarray(ok.osa_1v_many(query, cand3, lb2, mode=mode,
                                    interpret=True)).reshape(-1)

    q64 = query.astype(np.int64)
    idxs = list(range(0, B, 397)) + [0, 1, B - 1]
    for i in idxs:
        cand = chars[i, : lens[i]].astype(np.int64)
        assert lev[i] == oracle.levenshtein_uniform(q64, cand), i
        exp_lcs = (qlen + int(lens[i]) - oracle.indel(q64, cand)) // 2
        assert lcs[i] == exp_lcs, i
        assert osa[i] == oracle.osa(q64, cand), i


def test_w2_byte_mode():
    """len-64 query (W=2) over bytes >= 128 -> two-table gather path."""
    _run_case(qlen=64, LB=64, lo=90, hi=256)


def test_w2_local_mode():
    """ASCII corpus -> single-table fast path."""
    _run_case(qlen=64, LB=64, lo=97, hi=123)


def test_w1_short_query():
    """query <= 32 chars -> single u32 word."""
    _run_case(qlen=7, LB=64, lo=97, hi=123, seed=1)


def test_w3_long_query():
    """query > 64 chars -> three-word carry chain."""
    _run_case(qlen=80, LB=96, lo=97, hi=123, seed=2)


def test_query_longer_than_candidates():
    _run_case(qlen=64, LB=32, lo=97, hi=123, seed=3)


def test_jaro_components():
    """Jaro Pallas kernel vs the scalar oracle, all routes (W=1/2,
    local/byte tables, asymmetric lengths).  Small tiles (sub=8, B=1024)
    keep interpret mode fast."""
    from rapidfuzz_tpu.ops.pallas import jaro_kernel as jk
    from rapidfuzz_tpu.distance.jaro import sim_from_components

    Bs = 1024
    for qlen, LB, lo, hi, seed in [(32, 32, 97, 123, 0),
                                   (40, 32, 90, 256, 1),
                                   (20, 64, 97, 123, 2),
                                   (1, 32, 97, 99, 3)]:
        rng = np.random.default_rng(seed)
        q = rng.integers(lo, hi, qlen).astype(np.int32)
        chars, lens = _mk(rng, Bs, lo, hi, LB)
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars),
                                       jnp.asarray(lens), LB=LB)
        mode = lk.pick_mode(q, int(chars.max()))
        common, trans = jk.jaro_1v_many(q, cand3, lb2, mode=mode, sub=8,
                                        interpret=True)
        common = np.asarray(common).reshape(-1)[:Bs]
        trans = np.asarray(trans).reshape(-1)[:Bs]
        sim = sim_from_components(common, trans, np.full(Bs, qlen), lens)
        for i in list(range(0, Bs, 13)) + [0, 1, Bs - 1]:
            exp = oracle.jaro(q.astype(np.int64),
                              chars[i, : lens[i]].astype(np.int64))
            assert sim[i] == exp, (qlen, i, lens[i], sim[i], exp)


def test_weighted_levenshtein():
    """Weighted Wagner-Fischer Pallas kernel vs the oracle (asymmetric
    weights exercise the ins/del orientation)."""
    from rapidfuzz_tpu.ops.pallas import wlev_kernel as wk

    Bs = 1024
    for qlen, LB, lo, hi, wts, seed in [(16, 16, 97, 123, (1, 2, 3), 0),
                                        (33, 32, 97, 123, (3, 2, 1), 1),
                                        (10, 32, 90, 256, (2, 2, 5), 2)]:
        rng = np.random.default_rng(seed)
        q = rng.integers(lo, hi, qlen).astype(np.int32)
        chars, lens = _mk(rng, Bs, lo, hi, LB)
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars),
                                       jnp.asarray(lens), LB=LB)
        mode = lk.pick_mode(q, int(chars.max()))
        ins, dele, subc = wts
        out = np.asarray(wk.wlev_1v_many(
            q, cand3, lb2, ins=ins, dele=dele, sub_cost=subc, mode=mode,
            tile_sub=8, interpret=True)).reshape(-1)
        for i in list(range(0, Bs, 11)) + [0, 1, Bs - 1]:
            exp = oracle.levenshtein_weighted(
                q.astype(np.int64), chars[i, : lens[i]].astype(np.int64),
                ins, dele, subc)
            assert out[i] == exp, (qlen, wts, i, lens[i], out[i], exp)


def test_staged_query_equivalence():
    """stage_query pre-upload must give identical results to per-call
    table builds."""
    rng = np.random.default_rng(7)
    q = rng.integers(97, 123, 40).astype(np.int32)
    chars, lens = _mk(rng, B, 97, 123, 64)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=64)
    staged = lk.stage_query(q, "local")
    a = np.asarray(lk.lev_1v_many(q, cand3, lb2, mode="local",
                                  interpret=True))
    b = np.asarray(lk.lev_1v_many(q, cand3, lb2, mode="local",
                                  staged=staged, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_wide_query_chars_never_match():
    """Query codepoints above the byte range build no PM entries, so they
    can never match byte candidates — but their positions still count."""
    rng = np.random.default_rng(11)
    q = np.array([0x416, 97, 98, 0x1F600, 99], np.int32)   # Ж a b emoji c
    chars, lens = _mk(rng, B, 97, 123, 32)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=32)
    out = np.asarray(lk.lev_1v_many(q, cand3, lb2, mode="byte",
                                    interpret=True)).reshape(-1)
    for i in list(range(0, B, 97)) + [0, 1]:
        exp = oracle.levenshtein_uniform(
            q.astype(np.int64), chars[i, : lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)


def test_empty_query():
    rng = np.random.default_rng(4)
    chars, lens = _mk(rng, B, 97, 123, 32)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=32)
    out = np.asarray(lk.lev_1v_many(np.empty(0, np.int32), cand3, lb2,
                                    mode="local",
                                    interpret=True)).reshape(-1)
    np.testing.assert_array_equal(out[: len(lens)], lens)


def test_stream_kernel_long_candidates():
    """Streaming text-chunk kernel (stream_kernel): candidates beyond the
    single-block VMEM cap, Myers state carried across chunk grid steps
    (the reference's long-text block kernel, ``levenshtein.rs:769-1019``,
    proof fixture ``:2139-2161``)."""
    from rapidfuzz_tpu.ops.pallas import stream_kernel as sk

    rng = np.random.default_rng(3)
    Bs, LB, qlen = 4096, 1536, 48        # 3 chunks of 512
    q = rng.integers(97, 123, qlen).astype(np.int32)
    lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
    lens[0] = 0
    lens[1] = LB
    chars = rng.integers(97, 123, (Bs, LB)).astype(np.int32)
    for i, l in enumerate(lens):
        chars[i, l:] = -1
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    mode = lk.pick_mode(q, int(chars.max()))
    out = np.asarray(sk.lev_stream_1v_many(
        q, cand3, lb2, mode=mode, interpret=True)).reshape(-1)
    for i in list(range(0, Bs, 331)) + [0, 1]:
        exp = oracle.levenshtein_uniform(q.astype(np.int64),
                                         chars[i, : lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)


def test_pair_kernel_banded_long_pair():
    """Single-long-pair banded kernel (pair_kernel): multi-word band with
    carry-lookahead adds + XLA PM-window prepass; hint ladder escalates
    the band until certified (``levenshtein.rs:769-1019``, ``:1069-1088``)."""
    from rapidfuzz_tpu.ops.pallas import pair_kernel as pk

    rng = np.random.default_rng(0)
    a = rng.integers(97, 101, 1400).astype(np.int64)
    b = a.copy()
    for _ in range(40):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, b.size - 1))
        if op == 0:
            b[pos] = rng.integers(97, 101)
        elif op == 1:
            b = np.delete(b, pos)
        else:
            b = np.insert(b, pos, rng.integers(97, 101))
    exp = oracle.levenshtein_uniform(a, b)
    assert pk.lev_pair(a, b, interpret=True) == exp
    # cutoff semantics: exact at the boundary, None below it
    assert pk.lev_pair(a, b, score_cutoff=exp, interpret=True) == exp
    assert pk.lev_pair(a, b, score_cutoff=exp - 1, interpret=True) is None
    # cross-row carries + R escalation (distance > one row's cutoff)
    a2 = rng.integers(97, 101, 5000).astype(np.int64)
    b2 = rng.integers(97, 101, 4950).astype(np.int64)
    exp2 = oracle.levenshtein_uniform(a2, b2)
    assert exp2 > pk.max_cutoff(1)
    assert pk.lev_pair(a2, b2, interpret=True) == exp2


def test_nq_multi_query_kernel():
    """Multi-query kernel (``lev_kernel._run_nq``): NQ queries share one
    dispatch and the candidate tiles (grid ``(nblocks, q)``, query axis
    innermost).  Exact vs the oracle across a W bucket's length range,
    byte == local mode, empty query handled (the device form of the
    ``BatchComparator`` reuse pattern, ``levenshtein.rs:1625-1657``)."""
    rng = np.random.default_rng(3)
    LB = 64
    chars, lens = _mk(rng, B, 90, 256, LB)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)

    for qlens in ((64, 33, 40), (0, 5, 32)):
        qs = [rng.integers(90, 256, n).astype(np.int32) for n in qlens]
        out = np.asarray(lk.lev_nq_many(qs, cand3, lb2, mode="byte",
                                        interpret=True))
        for k, q in enumerate(qs):
            for i in list(range(0, B, 397)) + [0, 1, B - 1]:
                cand = chars[i, : lens[i]].astype(np.int64)
                exp = oracle.levenshtein_uniform(q.astype(np.int64), cand)
                assert out[k, i // 128, i % 128] == exp, (k, i)

    # local mode agrees with byte mode on an ASCII corpus
    chars2, lens2 = _mk(rng, B, 97, 123, LB)
    cand3a, lb2a = lk.prepare_corpus(jnp.asarray(chars2),
                                     jnp.asarray(lens2), LB=LB)
    qs = [rng.integers(97, 123, n).astype(np.int32) for n in (64, 50)]
    ob = np.asarray(lk.lev_nq_many(qs, cand3a, lb2a, mode="byte",
                                   interpret=True))
    ol = np.asarray(lk.lev_nq_many(qs, cand3a, lb2a, mode="local",
                                   interpret=True))
    assert np.array_equal(ob, ol)

    # mixed word buckets are rejected (callers bucket by W)
    with pytest.raises(ValueError):
        lk.lev_nq_many([np.zeros(10, np.int32), np.zeros(40, np.int32)],
                       cand3, lb2)


def test_osa_stream_kernel_long_candidates():
    """OSA streaming kernel: transposition history (prev d0/pm) carried in
    VMEM scratch across text-chunk grid steps (the reference's multi-word
    OSA block kernel, ``osa.rs:156-227``, handles any length)."""
    from rapidfuzz_tpu.ops.pallas import stream_kernel as sk

    rng = np.random.default_rng(13)
    Bs, LB, qlen = 4096, 1536, 48        # 3 chunks of 512
    q = rng.integers(97, 105, qlen).astype(np.int32)
    lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
    lens[0] = 0
    lens[1] = LB
    chars = rng.integers(97, 105, (Bs, LB)).astype(np.int32)
    # plant transpositions right at a chunk boundary (chars 511/512) so
    # the carried d0/pm history is exercised across the seam
    chars[2, :qlen] = q
    chars[2, qlen:] = -1
    lens[2] = qlen
    chars[3, :] = chars[1, :]
    chars[3, 511], chars[3, 512] = chars[1, 512], chars[1, 511]
    for i, l in enumerate(lens):
        chars[i, l:] = -1
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    mode = lk.pick_mode(q, int(chars.max()))
    out = np.asarray(sk.osa_stream_1v_many(
        q, cand3, lb2, mode=mode, interpret=True)).reshape(-1)
    for i in list(range(0, Bs, 331)) + [0, 1, 2, 3]:
        exp = oracle.osa(q.astype(np.int64),
                         chars[i, : lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)


def test_jaro_stream_kernel_long_candidates():
    """Streaming Jaro kernel: doubled chunk axis (flag pass, then
    transposition pass over the final claimed set), window/flag state in
    VMEM scratch, dynamic text-flag word indexing.  Exact components vs
    the oracle, including matches straddling chunk seams."""
    from rapidfuzz_tpu.ops.pallas import stream_kernel as sk
    from rapidfuzz_tpu.distance.jaro import sim_from_components

    rng = np.random.default_rng(17)
    Bs, LB, qlen = 4096, 1536, 40        # 3 chunks of 512
    q = rng.integers(97, 103, qlen).astype(np.int32)
    lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
    lens[0] = 0
    lens[1] = LB
    chars = rng.integers(97, 103, (Bs, LB)).astype(np.int32)
    chars[2, :qlen] = q                   # prefix case
    chars[3, :qlen] = q[::-1]             # heavy transpositions
    for i, l in enumerate(lens):
        chars[i, l:] = -1
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    mode = lk.pick_mode(q, int(chars.max()))
    common, trans = sk.jaro_stream_1v_many(q, cand3, lb2, mode=mode,
                                           interpret=True)
    common = np.asarray(common).reshape(-1)
    trans = np.asarray(trans).reshape(-1)
    for i in list(range(0, Bs, 331)) + [0, 1, 2, 3]:
        exp = oracle.jaro(q.astype(np.int64),
                          chars[i, : lens[i]].astype(np.int64))
        got = float(sim_from_components(
            np.int64(common[i]), np.int64(trans[i]),
            np.int64(qlen), np.int64(lens[i])))
        assert abs(got - exp) < 1e-12, (i, got, exp, common[i], trans[i])


def test_jaro_stream_8192_bucket():
    """Round-3 cap raise (JARO_STREAM_MAX_LB 4096 -> 8192): a 16-chunk
    bucket stays on the stream kernel instead of the scalarising XLA
    route.  Candidates sit near the far end so late chunks do real
    work."""
    from rapidfuzz_tpu.ops.pallas import stream_kernel as sk
    from rapidfuzz_tpu.distance.jaro import sim_from_components

    rng = np.random.default_rng(23)
    Bs, LB, qlen = 4096, 8192, 24
    q = rng.integers(97, 103, qlen).astype(np.int32)
    lens = np.zeros(Bs, np.int32)
    chars = np.full((Bs, LB), -1, np.int32)
    for i in range(Bs):
        n = int(rng.integers(0, 9)) * 1000 + int(rng.integers(0, 200))
        n = min(n, LB)
        chars[i, :n] = rng.integers(97, 103, n)
        lens[i] = n
    lens[1] = LB
    chars[1, :] = rng.integers(97, 103, LB)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    common, trans = sk.jaro_stream_1v_many(q, cand3, lb2, mode="byte",
                                           interpret=True)
    common = np.asarray(common).reshape(-1)
    trans = np.asarray(trans).reshape(-1)
    for i in list(range(0, Bs, 17)) + [1]:
        exp = oracle.jaro(q.astype(np.int64),
                          chars[i, : lens[i]].astype(np.int64))
        got = float(sim_from_components(
            np.int64(common[i]), np.int64(trans[i]),
            np.int64(qlen), np.int64(lens[i])))
        assert abs(got - exp) < 1e-12, (i, got, exp)


def test_damerau_long_kernel():
    """Long-candidate Damerau kernel (128 < LB <= 512): per-block scans
    with cross-block carries — exact vs the oracle, including
    transpositions straddling the 128-lane block seams."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(41)
    Bs, LB, qlen = 256, 300, 48
    q = rng.integers(97, 103, qlen).astype(np.int32)
    lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
    lens[:3] = [0, LB, qlen]
    chars = rng.integers(97, 103, (Bs, LB)).astype(np.int32)
    chars[2, :qlen] = q
    # transposition exactly across the 128-lane seam
    chars[3, :] = chars[1, :LB]
    chars[3, 127], chars[3, 128] = chars[1, 128], chars[1, 127]
    lens[3] = LB
    for i, l in enumerate(lens):
        chars[i, l:] = -1
    bt, lt, nb, sub = dk.prepare_corpus_long(chars, lens, sub=8)
    out = np.asarray(dk.damerau_long_1v_many(q, bt, lt, nb=nb, sub=sub,
                                             interpret=True))
    for i in list(range(0, Bs, 29)) + [0, 1, 2, 3]:
        exp = oracle.damerau(
            q.astype(np.int64), chars[i, : lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)


def test_damerau_long_kernel_2048():
    """512 < LB <= 2048 buckets on device (11-bit packed-scan columns):
    round-3 extension — previously these fell to the XLA scan
    (damerau_levenshtein.rs:111-168 parity at any length)."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(42)
    Bs, LB, qlen = 8, 1700, 500
    q = rng.integers(97, 123, qlen).astype(np.int32)
    chars = np.full((Bs, LB), -1, np.int32)
    lens = np.zeros(Bs, np.int32)
    for i in range(Bs):
        n = int(rng.integers(0, LB + 1)) if i else LB
        arr = rng.integers(97, 123, n).astype(np.int32)
        if i % 2 == 0 and n > qlen:
            arr[:qlen] = q               # query-like prefixes
        chars[i, :n] = arr
        lens[i] = n
    # transposition straddling a block seam
    if lens[1] > 1290:
        chars[1, 1279], chars[1, 1280] = chars[1, 1280], chars[1, 1279]
    bt, lt, nb, sub = dk.prepare_corpus_long(chars, lens)
    assert nb > 4                        # genuinely beyond the old cap
    out = np.asarray(dk.damerau_long_1v_many(q, bt, lt, nb=nb, sub=sub,
                                             interpret=True))
    for i in range(Bs):
        exp = oracle.damerau(
            q.astype(np.int64), chars[i, : lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)


def test_damerau_long_kernel_8192():
    """4096 < LB <= 8192 buckets on device (14-bit packed-scan columns,
    nb up to 64 at sub <= 64): round-4 extension of MAX_TEXT_LONG —
    previously these fell to the XLA scan."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    assert dk.MAX_TEXT_LONG == 8192
    rng = np.random.default_rng(43)
    Bs, LB, qlen = 8, 8192, 72
    q = rng.integers(97, 123, qlen).astype(np.int32)
    chars = np.full((Bs, LB), -1, np.int32)
    lens = np.zeros(Bs, np.int32)
    for i in range(Bs):
        n = int(rng.integers(4097, LB + 1)) if i else LB
        arr = rng.integers(97, 123, n).astype(np.int32)
        if i % 2 == 0:
            arr[:qlen] = q               # query-like prefixes
        chars[i, :n] = arr
        lens[i] = n
    # transposition straddling a block seam in the new >4096 region
    chars[1, 6143], chars[1, 6144] = chars[1, 6144], chars[1, 6143]
    bt, lt, nb, sub = dk.prepare_corpus_long(chars, lens)
    assert nb == 64 and sub * nb <= 4096   # budget holds at the new cap
    # the >=48-block tile-height rule must hold regardless of B: a
    # sub=64/nb=64 configuration OOMs on hardware
    # (evidence/damerau_long_8k_oom_r4.log), and interpret-mode tests
    # cannot see it — check the rule directly (ADVICE r4)
    assert dk.pick_sub_long(128, 64) * 64 <= 2048
    assert dk.pick_sub_long(128, 48) * 48 <= 2048
    assert dk.pick_sub_long(128, 47) * 47 <= 4096
    # multi-grid-block runs cap at sub*nb <= 2048: a sub=128/nb=32
    # corpus scan OOM'd the scoped vmem by 2.07M on chip (r5) — the
    # 4096 full-height budget was only ever proven single-block
    assert dk.pick_sub_long(4096, 32) * 32 <= 2048
    assert dk.pick_sub_long(4096, 16) * 16 <= 2048
    assert dk.pick_sub_long(128, 4) in (128, 64)   # single-block keeps
                                                   # full height
    out = np.asarray(dk.damerau_long_1v_many(q, bt, lt, nb=nb, sub=sub,
                                             interpret=True))
    for i in range(Bs):
        exp = oracle.damerau(
            q.astype(np.int64), chars[i, : lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)


def test_damerau_long_streamed_blocks():
    """The streamed-block long kernel (fori over blocks, dynamic scratch
    indexing, carries in scratch) is bit-identical to the unrolled form
    and the oracle, including cross-block transpositions; the wrapper
    routes nb > 48 to it at full-height tiles (Mosaic's unroll-scaled
    stack temporaries forced sub*nb <= 2048 on the unrolled form,
    evidence/damerau_long_8k_oom_r4.log)."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(71)
    Bs, LB, qlen = 8, 640, 40          # nb = 5
    q = rng.integers(97, 105, qlen).astype(np.int32)
    chars = np.full((Bs, LB), -1, np.int32)
    lens = np.zeros(Bs, np.int32)
    for i in range(Bs):
        n = int(rng.integers(129, LB + 1)) if i else LB
        arr = rng.integers(97, 105, n).astype(np.int32)
        if i % 2 == 0:
            arr[:qlen] = q
        chars[i, :n] = arr
        lens[i] = n
    chars[1, 300], chars[1, 301] = chars[1, 301], chars[1, 300]
    chars[2, 127], chars[2, 128] = chars[2, 128], chars[2, 127]  # seam
    bt, lt, nb, sub = dk.prepare_corpus_long(chars, lens)
    qpad = np.pad(q, (0, (-qlen) % 32), constant_values=-3)
    la = np.array([qlen], np.int32)
    a = np.asarray(dk._run_long(qpad, la, bt, lt, sub=sub, nb=nb,
                                interpret=True)).sum(axis=1)
    b = np.asarray(dk._run_long_stream(qpad, la, bt, lt, sub=sub, nb=nb,
                                       interpret=True)).sum(axis=1)
    assert (a == b).all(), np.nonzero(a != b)
    for i in range(Bs):
        exp = oracle.damerau(q.astype(np.int64),
                             chars[i, :lens[i]].astype(np.int64))
        assert b[i] == exp, (i, b[i], exp)


def test_jaro_stream_query_budget_fallback(monkeypatch):
    """A query too long for the stream kernel's W-word VMEM scratches
    (the on-chip crash dimension: a 9000-char query at LB=16384,
    evidence/hw_conformance_r5_jaro16k_stdout.log) routes to the XLA
    fallback with a RuntimeWarning, results identical; moderate
    queries stay on the stream route."""
    import warnings

    from rapidfuzz_tpu.ops.pallas import stream_kernel as sk
    from rapidfuzz_tpu.parallel.scan import CorpusScanner
    from rapidfuzz_tpu import oracle

    assert sk.jaro_stream_query_fits(128, 16384)
    assert not sk.jaro_stream_query_fits(9000, 16384)
    assert sk.jaro_stream_query_fits(2000, 8192)
    assert not sk.jaro_stream_query_fits(9000, 8192)

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(91)
    corpus = ["".join(chr(97 + int(c))
                      for c in rng.integers(0, 6, int(rng.integers(
                          1200, 2048)))) for _ in range(6)]
    sc = CorpusScanner(corpus, metric="jaro", bucket=2048)
    assert sc._stream
    big_q = "".join(chr(97 + int(c))
                    for c in rng.integers(0, 6, 4000))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        d = np.asarray(sc.distances(big_q))
        assert any(issubclass(x.category, RuntimeWarning) for x in w), \
            [str(x.message) for x in w]
    qe = np.array([ord(c) for c in big_q], np.int64)
    for i, c in enumerate(corpus):
        exp = 1.0 - oracle.jaro(qe, np.array([ord(x) for x in c],
                                             np.int64))
        assert abs(float(d[i]) - exp) < 1e-9, (i, d[i], exp)


def test_jaro_stream_multiword_query():
    """Jaro stream with a multi-word query (W > 1): cross-word window
    shifts and claim chains under the fori form."""
    from rapidfuzz_tpu.ops.pallas import stream_kernel as sk
    from rapidfuzz_tpu.distance.jaro import sim_from_components

    rng = np.random.default_rng(53)
    Bs, LB, qlen = 4096, 1536, 200        # W = 7 pattern words
    q = rng.integers(97, 103, qlen).astype(np.int32)
    lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
    lens[0] = qlen
    chars = rng.integers(97, 103, (Bs, LB)).astype(np.int32)
    chars[0, :qlen] = q[::-1]
    for i, l in enumerate(lens):
        chars[i, l:] = -1
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    mode = lk.pick_mode(q, int(chars.max()))
    common, trans = sk.jaro_stream_1v_many(q, cand3, lb2, mode=mode,
                                           interpret=True)
    common = np.asarray(common).reshape(-1)
    trans = np.asarray(trans).reshape(-1)
    for i in list(range(0, Bs, 613)) + [0]:
        exp = oracle.jaro(q.astype(np.int64),
                          chars[i, : lens[i]].astype(np.int64))
        got = float(sim_from_components(
            np.int64(common[i]), np.int64(trans[i]),
            np.int64(qlen), np.int64(lens[i])))
        assert abs(got - exp) < 1e-12, (i, got, exp)


def test_partial_ratio_window_kernel():
    """Windowed partial_ratio kernel (ops/pallas/partial_kernel.py) vs the
    host window sweep (``fuzz._best_window``), both fori (interpret) and
    flat (TPU) bodies, byte and local table modes, W=1 and W=2."""
    from rapidfuzz_tpu import fuzz
    from rapidfuzz_tpu.ops.pallas import partial_kernel as pk

    rng = np.random.default_rng(11)
    cases = [
        (32, 7, 97, 105, True),     # W=1, local mode, flat body
        (32, 30, 60, 200, True),    # W=1, byte mode, flat body
        (96, 50, 97, 105, False),   # W=2, fori body
        (64, 64, 97, 123, False),   # W=2 at the m == LB edge
    ]
    for LB, qlen, lo, hi, flat in cases:
        q = rng.integers(lo, hi, qlen).astype(np.int32)
        lens = rng.integers(0, LB + 1, B).astype(np.int32)
        lens[0] = 0
        lens[1] = LB
        lens[2] = min(qlen, LB)
        chars = rng.integers(lo, hi, (B, LB)).astype(np.int32)
        for i, l in enumerate(lens):
            chars[i, l:] = -1
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars),
                                       jnp.asarray(lens), LB=LB)
        mode = lk.pick_mode(q, int(chars.max()))
        num, den, wst, wen = pk.partial_ratio_1v_many(
            q, cand3, lb2, mode=mode, interpret=True, flat=flat)
        num = np.asarray(num).reshape(-1)
        den = np.asarray(den).reshape(-1)
        wst = np.asarray(wst).reshape(-1)
        wen = np.asarray(wen).reshape(-1)
        for i in list(range(0, B, 401)) + [0, 1, 2, B - 1]:
            n = int(lens[i])
            if n < qlen:
                continue  # kernel contract: host re-scores these
            exp, (es, ee) = fuzz._best_window(
                q.astype(np.int64), chars[i, :n].astype(np.int64))
            assert abs(exp - num[i] / den[i]) < 1e-12, (LB, qlen, i)
            # best-window positions match the host sweep's tie-breaks
            assert (wst[i], wen[i]) == (es, ee), (LB, qlen, i)


def test_partial_ratio_static_body():
    """The quantized-static window body (``_kernel_q``, the hardware
    default) returns (num, den, start, end) IDENTICAL to the dynamic
    body on every lane — across word classes, table modes, exact
    (m % 8 == 0) and tail-masked quantization, and clipped/empty
    candidates."""
    from rapidfuzz_tpu.ops.pallas import partial_kernel as pk

    rng = np.random.default_rng(23)
    cases = [
        (32, 5, 97, 105),     # W=1, M8=8 tail-masked, local mode
        (32, 24, 60, 200),    # W=1, M8=24 exact, byte mode
        (48, 33, 97, 105),    # W=2, M8=40 tail-masked
    ]
    for LB, qlen, lo, hi in cases:
        Bs = 128
        q = rng.integers(lo, hi, qlen).astype(np.int32)
        lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
        lens[0] = 0
        lens[1] = LB
        lens[2] = min(qlen, LB)
        chars = rng.integers(lo, hi, (Bs, LB)).astype(np.int32)
        for i, l in enumerate(lens):
            chars[i, l:] = -1
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars),
                                       jnp.asarray(lens), LB=LB)
        mode = lk.pick_mode(q, int(chars.max()))
        dyn = pk.partial_ratio_1v_many(q, cand3, lb2, mode=mode,
                                       interpret=True, static_m=False)
        sta = pk.partial_ratio_1v_many(q, cand3, lb2, mode=mode,
                                       interpret=True, static_m=True)
        for name, a, b in zip(("num", "den", "st", "en"), dyn, sta):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{LB},{qlen},{name}")


def test_damerau_lastpos_variant():
    """The lastpos-tile Damerau kernel (``_kernel_lp``: strict last-match
    positions hoisted out of the row loop into per-distinct-char packed
    tiles) is bit-identical to the packed-scan kernel and the oracle
    (``damerau_levenshtein.rs:111-168`` semantics) across segment widths,
    including empty/full candidates and a query whose distinct-char count
    straddles the nd=8 bucket boundary."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(77)
    for LB, qspan, qlen in [(14, 6, 9), (60, 30, 37), (120, 64, 70)]:
        Bs = 64 * (128 // dk.pick_seg(LB))
        lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
        lens[0] = 0
        lens[1] = LB
        chars = np.full((Bs, LB), -1, np.int32)
        for i, l in enumerate(lens):
            chars[i, :l] = rng.integers(97, 97 + qspan, l)
        bt, lt, seg = dk.prepare_corpus_cols(chars, lens, sub=8)
        q = rng.integers(97, 97 + qspan, qlen).astype(np.int64)
        a = np.asarray(dk.damerau_1v_many(
            q, jnp.asarray(bt), jnp.asarray(lt), seg=seg, interpret=True,
            variant="lp"))
        b = np.asarray(dk.damerau_1v_many(
            q, jnp.asarray(bt), jnp.asarray(lt), seg=seg, interpret=True,
            variant="pack"))
        assert (a == b).all(), (LB, np.nonzero(a != b))
        for i in list(range(0, Bs, 13)) + [0, 1]:
            exp = oracle.damerau(q, chars[i, :lens[i]].astype(np.int64))
            assert a[i] == exp, (LB, i, a[i], exp)
    # > ND_CAP distinct chars: auto falls back to the packed-scan kernel
    qwide = np.arange(1000, 1000 + dk.ND_CAP + 3, dtype=np.int64)
    assert dk._encode_query_lp(qwide.astype(np.int32)) is None


def test_damerau_seq_variant():
    """The sequential-pair Damerau kernel (``_kernel_sq``: pairs in
    lanes, fully sequential (i,j) DP, zero lane scans) is bit-identical
    to the lane-transposed kernel and the oracle
    (``damerau_levenshtein.rs:111-168`` semantics) across bucket widths,
    including empty/full candidates, an empty query, and
    transposition-heavy pairs."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(53)
    for LB, qspan, qlen in [(5, 4, 7), (30, 6, 22), (64, 26, 64),
                            (100, 8, 41)]:
        Bs = dk.SEQ_SUB * 128
        lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
        lens[0] = 0
        lens[1] = LB
        chars = np.full((Bs, LB), -1, np.int32)
        for i, l in enumerate(lens):
            chars[i, :l] = rng.integers(97, 97 + qspan, l)
        # transposition-heavy: candidate 2 = query with two swaps
        q = rng.integers(97, 97 + qspan, qlen).astype(np.int64)
        sw = q[:LB].copy()
        if sw.size >= 4:
            sw[0], sw[1] = sw[1], sw[0]
            sw[-1], sw[-2] = sw[-2], sw[-1]
        chars[2, :] = -1
        chars[2, :sw.size] = sw
        lens[2] = sw.size
        bc, lt, lbmax = dk.prepare_corpus_seq(chars, lens)
        a = np.asarray(dk.damerau_seq_1v_many(
            q, jnp.asarray(bc), jnp.asarray(lt), lbmax=lbmax,
            interpret=True))
        bt, lt2, seg = dk.prepare_corpus_cols(chars, lens, sub=8)
        b = np.asarray(dk.damerau_1v_many(
            q, jnp.asarray(bt), jnp.asarray(lt2), seg=seg, interpret=True))
        assert (a == b).all(), (LB, np.nonzero(a != b))
        for i in list(range(0, Bs, 131)) + [0, 1, 2]:
            exp = oracle.damerau(q, chars[i, :lens[i]].astype(np.int64))
            assert a[i] == exp, (LB, i, a[i], exp)
        # empty query: distance == candidate length
        e = np.asarray(dk.damerau_seq_1v_many(
            np.empty(0, np.int64), jnp.asarray(bc), jnp.asarray(lt),
            lbmax=lbmax, interpret=True))
        assert (e == lens).all()


def test_damerau_seqband_kernel():
    """Cutoff-banded sequential-pair Damerau (``_kernel_sqband``):
    exact wherever the true distance <= kband, and > kband otherwise,
    across band radii, bucket widths, and query-longer/shorter-than-
    text shapes — including transposition-dense near-query candidates
    (the band must carry Zhao-Sahni's FR/K structures through the
    moving window).  The reference computes the full O(N*M) under a
    cutoff (``damerau_levenshtein.rs:111-168``); the band discipline
    matches its Levenshtein small-band kernel
    (``levenshtein.rs:509-617``)."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(61)
    Bs = dk.SEQ_SUB * 128
    for alpha, maxlen, qlen, kb in [(4, 64, 64, 7), (26, 64, 60, 3),
                                    (6, 48, 80, 15), (26, 100, 128, 7)]:
        chars = np.full((Bs, maxlen), -1, np.int32)
        lens = rng.integers(0, maxlen + 1, Bs).astype(np.int32)
        lens[:4] = [0, 1, maxlen, min(qlen, maxlen)]
        for i in range(Bs):
            chars[i, :lens[i]] = rng.integers(97, 97 + alpha, lens[i])
        q = rng.integers(97, 97 + alpha, qlen).astype(np.int64)
        # plant near-query candidates: few edits incl. transpositions
        for i in range(16, 72):
            c = q[: min(qlen, maxlen)].copy()
            for _ in range(int(rng.integers(0, kb + 3))):
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, max(1, len(c) - 1)))
                if op == 0:
                    c[pos] = rng.integers(97, 97 + alpha)
                elif op == 1 and pos + 1 < len(c):
                    c[pos], c[pos + 1] = c[pos + 1], c[pos]
                else:
                    c = np.delete(c, pos)
            c = c[:maxlen]
            chars[i, :] = -1
            chars[i, : len(c)] = c
            lens[i] = len(c)
        bc, lt, lbmax = dk.prepare_corpus_seq(chars, lens)
        out = np.asarray(dk.damerau_seqband_1v_many(
            q, bc, lt, lbmax=lbmax, kband=kb, interpret=True))
        for i in list(range(0, Bs, 97)) + list(range(0, 72)):
            exp = oracle.damerau(q, chars[i, :lens[i]].astype(np.int64))
            if exp <= kb:
                assert out[i] == exp, (maxlen, kb, i, out[i], exp)
            else:
                assert out[i] > kb, (maxlen, kb, i, out[i], exp)
        # empty query: distance == candidate length
        e = np.asarray(dk.damerau_seqband_1v_many(
            np.empty(0, np.int64), bc, lt, lbmax=lbmax, kband=kb,
            interpret=True))
        assert (e == lens).all()


def test_damerau_band_scanner_route(monkeypatch):
    """CorpusScanner routes small integer cutoffs to the banded Damerau
    kernel and keeps the (values, valid) mask contract exact; larger
    cutoffs stay on the full kernel (pick_dam_band gates on bucket
    width)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
    from rapidfuzz_tpu.parallel.scan import CorpusScanner

    assert dk.pick_dam_band(3, 64) == 3
    assert dk.pick_dam_band(4, 64) == 7
    assert dk.pick_dam_band(15, 64) == 15
    assert dk.pick_dam_band(16, 64) is None
    assert dk.pick_dam_band(15, 48) is None    # band ~ full walk: skip
    assert dk.pick_dam_band(7, 128) == 7

    rng = np.random.default_rng(67)
    corpus = []
    for _ in range(500):
        l = int(rng.integers(0, 65))
        corpus.append("".join(chr(97 + int(c))
                              for c in rng.integers(0, 7, l)))
    q = corpus[7][:48] + "xy"
    sc = CorpusScanner(corpus, metric="damerau_levenshtein")
    qe = np.array([ord(c) for c in q], np.int64)
    for cut in (0, 2, 7, 15):
        res = sc.distances(q, score_cutoff=cut)
        for i, s in enumerate(corpus):
            exp = oracle.damerau(
                qe, np.array([ord(x) for x in s], np.int64))
            if exp <= cut:
                assert res.valid[i] and res.values[i] == exp, (cut, i)
            else:
                assert not res.valid[i], (cut, i, exp)


def test_damerau_band_long_scanner_route(monkeypatch):
    """Cutoff-banded LONG Damerau (streamed text chunks): >128-char
    buckets under a small cutoff route the O(k*M) band kernel —
    length-independent band, chunk-seam transpositions included.  The
    full kernel still serves the no-cutoff scan."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.parallel.scan import CorpusScanner

    rng = np.random.default_rng(83)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 6, 700))
    corpus = []
    for _ in range(24):
        s = list(base)
        for _ in range(int(rng.integers(0, 12))):
            op = int(rng.integers(0, 3))
            p = int(rng.integers(0, max(1, len(s) - 1)))
            if op == 0:
                s[p] = chr(97 + int(rng.integers(0, 6)))
            elif op == 1 and p + 1 < len(s):
                s[p], s[p + 1] = s[p + 1], s[p]
            else:
                del s[p]
        corpus.append("".join(s))
    # transposition exactly on the chunk seam (col 512)
    s = list(base)
    s[511], s[512] = s[512], s[511]
    corpus += ["".join(s), "", "a", base]
    sc = CorpusScanner(corpus, metric="damerau_levenshtein")
    assert sc._dam_long
    qe = np.array([ord(c) for c in base], np.int64)
    for cut in (1, 7, 15):
        res = sc.distances(base, score_cutoff=cut)
        for i, st in enumerate(corpus):
            exp = oracle.damerau(
                qe, np.array([ord(x) for x in st], np.int64))
            if exp <= cut:
                assert res.valid[i] and res.values[i] == exp, \
                    (cut, i, exp, res.values[i])
            else:
                assert not res.valid[i], (cut, i, exp)
    d = sc.distances(base)
    assert int(d[len(corpus) - 1]) == 0


def test_dam_band_stagings_agree(monkeypatch):
    """The host staging (prepare_corpus_seq_long) and the scanner's
    lazy device staging (_stage_dam_band) realize the same layout
    contract — twin implementations must stay in lockstep (r5 review
    finding)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
    from rapidfuzz_tpu.parallel.scan import CorpusScanner
    from rapidfuzz_tpu.utils import codec

    rng = np.random.default_rng(101)
    corpus = ["".join(chr(97 + int(c))
                      for c in rng.integers(0, 8, int(rng.integers(
                          130, 700)))) for _ in range(20)]
    sc = CorpusScanner(corpus, metric="damerau_levenshtein")
    assert sc._dam_long
    bc_dev, lt_dev, lbmax_dev = sc._stage_dam_band()
    chars, lens = codec.encode_batch(corpus, None)
    # host staging over the SAME padded row set the scanner holds
    B8 = int(sc._dam_b.shape[0])
    ch = np.full((B8, chars.shape[1]), -1, np.int32)
    ch[: chars.shape[0]] = chars
    ln = np.zeros(B8, np.int32)
    ln[: lens.shape[0]] = lens
    bc_host, lt_host, lbmax_host = dk.prepare_corpus_seq_long(ch, ln)
    assert lbmax_dev == lbmax_host
    assert np.array_equal(np.asarray(lt_dev), lt_host)
    assert np.array_equal(np.asarray(bc_dev), bc_host)


def test_damerau_seq_int16_mask_body():
    """The compare-free mask-algebra int16 body (``_kernel_sq16m`` —
    add/sub/bitwise/arith-shift only, for Mosaic targets without packed
    i16 cmpi) matches the cmp-based i16 body and the oracle, and routes
    under RAPIDFUZZ_TPU_DAMERAU_I16=mask."""
    import os

    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(67)
    LB, sub = 20, 8
    B = sub * 128
    lens = rng.integers(0, LB + 1, B).astype(np.int32)
    lens[:3] = [0, 1, LB]
    chars = np.full((B, LB), -2, np.int32)
    for i, l in enumerate(lens):
        chars[i, :l] = rng.integers(97, 102, l)
    bc, lt, lbmax = dk.prepare_corpus_seq(chars, lens, sub=sub,
                                          dtype=np.int16)
    q = rng.integers(97, 102, 13).astype(np.int64)
    qpad, la = dk._encode_query_rows(q)
    args = (jnp.asarray(qpad), jnp.array([la], np.int32),
            jnp.asarray(bc), jnp.asarray(lt))
    a = np.asarray(dk._run_sq16m(*args, sub=sub, lbmax=lbmax,
                                 interpret=True)).reshape(-1)
    b = np.asarray(dk._run_sq16(*args, sub=sub, lbmax=lbmax,
                                interpret=True)).reshape(-1)
    assert (a == b).all()
    for i in list(range(0, B, 211)) + [0, 1, 2]:
        exp = oracle.damerau(q, chars[i, :lens[i]].astype(np.int64))
        assert a[i] == exp, (i, a[i], exp)
    os.environ["RAPIDFUZZ_TPU_DAMERAU_I16"] = "mask"
    try:
        out = np.asarray(dk.damerau_seq_1v_many(q, bc, lt, lbmax=lbmax,
                                                sub=sub, interpret=True))
        assert (out == a).all()
    finally:
        del os.environ["RAPIDFUZZ_TPU_DAMERAU_I16"]


def test_damerau_seq_int16_routing():
    """int16 staging/routing edges of the sequential-pair kernel:
    ``dtype=np.int16`` stages int16 tiles (experimental 2-per-lane body;
    default staging is int32 — the hardware-validated route); chars
    beyond ``I16_CHAR_MAX`` force int32 staging even when int16 is
    requested; a wide-char query against an int16 corpus is sanitized
    (those chars can't match — semantics preserved, no aliasing after
    the cast); ``la > SEQ_LA_MAX_I16`` widens the tiles on device for
    the int32 body."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(59)
    LB, sub = 32, 8
    B = sub * 128
    lens = rng.integers(0, LB + 1, B).astype(np.int32)
    lens[:3] = [0, 1, LB]
    chars = np.full((B, LB), -2, np.int32)
    for i, l in enumerate(lens):
        chars[i, :l] = rng.integers(97, 103, l)
    # default staging is int32 (the hardware-validated route)
    bc32, lt32, _ = dk.prepare_corpus_seq(chars, lens, sub=sub)
    assert bc32.dtype == np.int32 and lt32.dtype == np.int32
    bc, lt, lbmax = dk.prepare_corpus_seq(chars, lens, sub=sub,
                                          dtype=np.int16)
    assert bc.dtype == np.int16 and lt.dtype == np.int16

    # wide-char query vs int16 corpus: sanitize path
    qw = np.array([70000, 97, 98, 70001, 99], np.int64)
    got = np.asarray(dk.damerau_seq_1v_many(qw, bc, lt, lbmax=lbmax,
                                            sub=sub, interpret=True))
    assert got.dtype == np.int32
    for c in (0, 1, 2, 17):
        exp = oracle.damerau(qw, chars[c, :lens[c]].astype(np.int64))
        assert got[c] == exp, (c, got[c], exp)

    # wide-char corpus: staging falls back to int32 even when int16 is
    # requested, still exact
    chw = chars.copy()
    chw[5, 0] = 70000
    lens[5] = max(lens[5], 1)
    bc2, lt2, lbm2 = dk.prepare_corpus_seq(chw, lens, sub=sub,
                                           dtype=np.int16)
    assert bc2.dtype == np.int32
    got = np.asarray(dk.damerau_seq_1v_many(qw, bc2, lt2, lbmax=lbm2,
                                            sub=sub, interpret=True))
    exp = oracle.damerau(qw, chw[5, :lens[5]].astype(np.int64))
    assert got[5] == exp

    # la beyond the int16 value-range cap: tiles widen on device
    cap = dk.SEQ_LA_MAX_I16
    try:
        dk.SEQ_LA_MAX_I16 = 3
        q = rng.integers(97, 103, 6).astype(np.int64)
        got = np.asarray(dk.damerau_seq_1v_many(q, bc, lt, lbmax=lbmax,
                                                sub=sub, interpret=True))
        exp = oracle.damerau(q, chars[17, :lens[17]].astype(np.int64))
        assert got[17] == exp
    finally:
        dk.SEQ_LA_MAX_I16 = cap


def test_damerau_small_segments():
    """Damerau lane-segment widths 16 and 32: short corpora pack 8/4
    candidates per 128-lane row with shorter Hillis-Steele chains;
    exact vs the oracle including empty and full-width candidates."""
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(31)
    for LB, seg_exp in [(14, 16), (30, 32)]:
        Bs = 512 * (128 // seg_exp)
        lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
        lens[0] = 0
        lens[1] = LB
        chars = np.full((Bs, LB), -1, np.int32)
        for i, l in enumerate(lens):
            chars[i, :l] = rng.integers(97, 103, l)
        bt, lt, seg = dk.prepare_corpus_cols(chars, lens)
        assert seg == seg_exp, (LB, seg)
        q = rng.integers(97, 103, 37).astype(np.int64)
        out = np.asarray(dk.damerau_1v_many(
            q, jnp.asarray(bt), jnp.asarray(lt), seg=seg, interpret=True))
        for i in list(range(0, Bs, 97)) + [0, 1]:
            exp = oracle.damerau(q, chars[i, :lens[i]].astype(np.int64))
            assert out[i] == exp, (LB, i, out[i], exp)
