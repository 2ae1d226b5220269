"""Sharded scan / top-k / process-layer tests on the virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax

from rapidfuzz_tpu.parallel import CorpusScanner, data_mesh, topk_merge
from rapidfuzz_tpu.distance import levenshtein as lev
from rapidfuzz_tpu.models import cdist, extract, extract_one


@pytest.fixture(scope="module")
def mesh():
    return data_mesh(8, platform="cpu")


def test_mesh(mesh):
    assert mesh.shape == {"data": 8}


def test_topk_merge(mesh):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    scores = np.arange(64, dtype=np.float32)
    np.random.default_rng(0).shuffle(scores)
    idx = np.arange(64, dtype=np.int32)
    s = jax.device_put(scores, NamedSharding(mesh, P("data")))
    i = jax.device_put(idx, NamedSharding(mesh, P("data")))
    vals, ids = topk_merge(s, i, 5, mesh, largest=True)
    np.testing.assert_array_equal(np.asarray(vals), [63, 62, 61, 60, 59])
    assert all(scores[j] == v for j, v in zip(np.asarray(ids),
                                              np.asarray(vals)))


def test_corpus_scanner(mesh):
    corpus = ["apple", "apply", "ape", "maple", "orange", "grape",
              "pineapple", "app", "", "apple"] * 3
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh, bucket=32)
    d = sc.distances("apple")
    for s, g in zip(corpus, d):
        assert g == lev.distance("apple", s)
    vals, ids = sc.topk("apple", k=4)
    assert vals[0] == 0 and corpus[ids[0]] == "apple"
    assert sorted(vals) == list(vals)


def test_corpus_scanner_metrics(mesh):
    corpus = ["abcd", "abdc", "xxxx", "ab"]
    for metric, expected in [
        ("levenshtein", [0, 2, 4, 2]),
        ("osa", [0, 1, 4, 2]),
        ("damerau_levenshtein", [0, 1, 4, 2]),
        ("indel", [0, 2, 8, 2]),
        ("lcs_seq", [0, 1, 4, 2]),
        ("hamming", [0, 2, 4, 2]),
        ("prefix", [0, 2, 4, 2]),
        ("postfix", [0, 4, 4, 4]),
    ]:
        sc = CorpusScanner(corpus, metric=metric, mesh=mesh, bucket=32)
        np.testing.assert_array_equal(sc.distances("abcd"), expected)


def test_corpus_scanner_jaro_family(mesh):
    from rapidfuzz_tpu.distance import jaro, jaro_winkler

    corpus = ["apple", "apples", "maple", "orange", "", "charlie"]
    for metric, mod, kw in [("jaro", jaro, {}),
                            ("jaro_winkler", jaro_winkler, {})]:
        sc = CorpusScanner(corpus, metric=metric, mesh=mesh, bucket=32)
        d = sc.distances("charles")
        for s, g in zip(corpus, d):
            assert g == mod.distance("charles", s), (metric, s)
        vals, ids = sc.topk("charles", k=2)
        assert corpus[ids[0]] == "charlie"
        assert vals[0] == mod.distance("charles", "charlie")
    # custom prefix weight flows through
    sc = CorpusScanner(corpus, metric="jaro_winkler", mesh=mesh, bucket=32,
                       prefix_weight=0.2)
    d = sc.distances("charles")
    assert d[5] == jaro_winkler.distance("charles", "charlie",
                                         prefix_weight=0.2)


def test_query_outside_corpus_domain(mesh):
    """Regression: a query with negative/out-of-int32 chars against an
    UN-remapped corpus must not be vocab-remapped alone (that broke char
    equality and returned distance 3 instead of 1 here)."""
    sc = CorpusScanner(["ab", "xy"], metric="levenshtein", mesh=mesh,
                       bucket=32)
    np.testing.assert_array_equal(
        sc.distances(np.array([-7, 97, 98])), [1, 3])
    np.testing.assert_array_equal(
        sc.distances(np.array([2 ** 40, 97, 98])), [1, 3])


def test_corpus_scanner_vocab_remap(mesh):
    """Corpus elements above int32 go through a shared dense vocab; queries
    must map through the same vocab (SURVEY.md hard part #4)."""
    big = 1 << 40
    corpus = [[big, big + 1], [big, big + 1, big + 2], [7, 8]]
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh, bucket=32)
    np.testing.assert_array_equal(sc.distances([big, big + 1]), [0, 1, 2])
    # query chars absent from the corpus can never match
    np.testing.assert_array_equal(sc.distances([big + 99, big + 1]),
                                  [1, 2, 2])


def test_corpus_scanner_cutoff(mesh):
    corpus = ["apple", "apply", "ape", "maple", "orange", "grape", ""]
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh, bucket=32)
    res = sc.distances("apple", score_cutoff=2)
    assert res.tolist() == [lev.distance("apple", s, score_cutoff=2)
                            for s in corpus]
    vals, ids = sc.topk("apple", k=10, score_cutoff=2)
    assert len(vals) == 4    # apple, apply, ape, maple
    assert all(v <= 2 for v in vals)
    assert corpus[ids[0]] == "apple" and vals[0] == 0


def test_banded_kernel_interpret():
    """Banded pallas kernel: exact under cutoff, masked above."""
    import jax.numpy as jnp
    from rapidfuzz_tpu.ops.pallas import band_kernel as bk
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
    from rapidfuzz_tpu import oracle

    rng = np.random.default_rng(0)
    Bs, LB, qlen, cutoff = 1024, 64, 64, 7
    q = rng.integers(97, 123, qlen).astype(np.int32)
    lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
    chars = rng.integers(97, 123, (Bs, LB)).astype(np.int32)
    for i in range(0, Bs, 3):       # near-copies under the cutoff
        chars[i, :qlen] = q
        for _ in range(int(rng.integers(0, cutoff + 3))):
            chars[i, rng.integers(0, qlen)] = rng.integers(97, 123)
        lens[i] = qlen
    for i, l in enumerate(lens):
        chars[i, l:] = -1
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    out = np.asarray(bk.lev_banded_1v_many(
        q, cand3, lb2, cutoff=cutoff, mode="local", sub=8,
        interpret=True)).reshape(-1)
    for i in range(0, Bs, 7):
        exp = oracle.levenshtein_uniform(
            q.astype(np.int64), chars[i, : lens[i]].astype(np.int64))
        if exp <= cutoff:
            assert out[i] == exp, (i, out[i], exp)
        else:
            assert out[i] > cutoff, (i, out[i], exp)


def test_banded_fast_static_kernel():
    """Fast band variant (``band_kernel._fast_kernel``): band semiwidth
    pinned at MAX_CUTOFF with the true cutoff applied in the final mask,
    per-step shifts pre-funneled into host-built tables.
    Exact-under/masked-over vs the oracle for
    boundary query lengths (la=16 is the smallest eligible), every
    cutoff parity, byte and local modes; la <= 15 falls back to the
    dynamic kernel (``levenshtein.rs:509-617`` routing contract)."""
    import jax.numpy as jnp
    from rapidfuzz_tpu.ops.pallas import band_kernel as bk
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
    from rapidfuzz_tpu import oracle

    rng = np.random.default_rng(5)
    Bs = 1024   # sub=8 tiles need B >= 8*128 candidates
    for qlen, cutoff, mode, LB in [(16, 15, "byte", 64),
                                   (17, 0, "byte", 64),
                                   (40, 8, "local", 64),
                                   (64, 15, "byte", 64),
                                   (48, 11, "byte", 48),
                                   (12, 5, "byte", 64),   # la<16 -> dyn
                                   (64, 31, "byte", 96),  # 2-word band
                                   (40, 16, "local", 64),
                                   (80, 47, "byte", 128),  # 3-word band
                                   (64, 33, "byte", 256)]:  # fori form
        # local mode indexes 128-entry tables by char value: only valid
        # for query-local ids < 128 (the scanner remaps first)
        lo, hi = (0, 128) if mode == "local" else (90, 256)
        lens = rng.integers(0, LB + 1, Bs).astype(np.int32)
        chars = rng.integers(lo, hi, (Bs, LB)).astype(np.int32)
        for i, l in enumerate(lens):
            chars[i, l:] = -1
        q = rng.integers(lo, hi, qlen).astype(np.int32)
        # plant near-copies so the <= cutoff branch is exercised
        planted = chars.copy()
        for i in range(0, Bs, 4):
            planted[i, :] = -1
            planted[i, :qlen] = q
            for _ in range(int(rng.integers(0, cutoff + 2))):
                planted[i, rng.integers(0, qlen)] = rng.integers(lo, hi)
            lens[i] = qlen
        c3, l2 = lk.prepare_corpus(jnp.asarray(planted),
                                   jnp.asarray(lens), LB=LB)
        out = np.asarray(bk.lev_banded_1v_many(
            q, c3, l2, cutoff=cutoff, mode=mode, sub=8,
            interpret=True)).reshape(-1)
        for i in range(0, Bs, 5):
            exp = oracle.levenshtein_uniform(
                q.astype(np.int64), planted[i, : lens[i]].astype(np.int64))
            if exp <= cutoff:
                assert out[i] == exp, (qlen, cutoff, i, out[i], exp)
            else:
                assert out[i] > cutoff, (qlen, cutoff, i, out[i], exp)


def test_corpus_scanner_weighted(mesh):
    from rapidfuzz_tpu.distance.levenshtein import WeightTable

    corpus = ["sitting", "mitten", "kitten", "", "kittenkitten"]
    for w in [WeightTable(1, 2, 3), WeightTable(3, 2, 1), WeightTable(1, 1, 2),
              WeightTable(2, 2, 2), WeightTable(0, 0, 1), WeightTable(2, 2, 5)]:
        sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh,
                           bucket=32, weights=w)
        d = sc.distances("kitten")
        for s, g in zip(corpus, d):
            assert g == lev.distance("kitten", s, weights=w), (w, s, g)


def test_corpus_scanner_long_strings(mesh):
    """Buckets beyond the Pallas VMEM cap fall back to the XLA path."""
    rng = np.random.default_rng(5)
    long1 = "".join(chr(97 + c) for c in rng.integers(0, 4, 1500))
    long2 = long1[:700] + "x" * 5 + long1[705:]
    corpus = [long1, long2, "short", ""]
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh)
    d = sc.distances(long1)
    assert d[0] == 0 and d[1] == lev.distance(long1, long2)
    assert d[2] == lev.distance(long1, "short") and d[3] == 1500


def test_scan_many_checkpoint_resume(mesh, tmp_path):
    corpus = ["apple", "apply", "ape", "maple", "orange", "grape"]
    queries = ["apple", "grape", "banana", "app", "orange", "pear"]
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh, bucket=32)
    full = sc.scan_many(queries)
    for qi, q in enumerate(queries):
        np.testing.assert_array_equal(full[qi], sc.distances(q))

    ck = str(tmp_path / "scan.ck")
    partial = sc.scan_many(queries, checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_array_equal(partial, full)
    # resume: the completed checkpoint short-circuits recomputation
    resumed = sc.scan_many(queries, checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_array_equal(resumed, full)

    # genuine mid-run resume: poison the first two completed rows in a
    # hand-written checkpoint; a resumed run must keep them (proof it
    # resumes rather than recomputes) and fill the rest correctly
    poisoned = full.copy()
    poisoned[:2] = 123.0
    np.savez(ck + ".tmp.npz", n=sc.n, nq=len(queries), k=0, done=2,
             vals=poisoned, ids=np.empty(0),
             fp=sc._ckpt_fingerprint(queries))
    import os as _os
    _os.replace(ck + ".tmp.npz", ck)
    resumed2 = sc.scan_many(queries, checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_array_equal(resumed2[:2], poisoned[:2])
    np.testing.assert_array_equal(resumed2[2:], full[2:])

    # a checkpoint for DIFFERENT queries of the same shape must be
    # rejected (content fingerprint), not silently spliced in
    other = ["maple", "pear", "apple", "app", "orange", "banana"]
    recomputed = sc.scan_many(other, checkpoint_path=ck, checkpoint_every=2)
    for qi, q in enumerate(other):
        np.testing.assert_array_equal(recomputed[qi], sc.distances(q))

    # top-k variant
    vals, ids = sc.scan_many(queries, k=2)
    v0, i0 = sc.topk(queries[0], 2)
    np.testing.assert_array_equal(vals[0], v0)
    np.testing.assert_array_equal(ids[0], i0)


def test_scan_many_grouped_multiquery(monkeypatch):
    """scan_many's grouped multi-query dispatch (``_distances_many``):
    single-device uniform-Levenshtein Pallas scans batch NQ_GROUP queries
    per kernel launch (``lev_kernel.lev_nq_many``), grouped by word
    bucket and PM mode, padded by repeating the last query.  Results must
    equal the per-query path for mixed-length query streams (W=1 and W=2
    buckets, an empty query, chars forcing byte mode), and the k variant
    must match topk."""
    from jax.sharding import Mesh

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    rng = np.random.default_rng(11)
    corpus = ["".join(chr(97 + c) for c in rng.integers(0, 26, n))
              for n in rng.integers(0, 30, 40)] + ["kitten", ""]
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1, bucket=32)
    assert sc._pallas and sc._nq_eligible()
    queries = (["kitten", "", "sitting", chr(200) * 3, "a" * 40, "b" * 35]
               + ["".join(chr(97 + c) for c in rng.integers(0, 26, 7))
                  for _ in range(7)])   # 13 queries: pads a partial group
    got = sc.scan_many(queries)
    for qi, q in enumerate(queries):
        np.testing.assert_array_equal(got[qi], sc.distances(q)), qi

    vals, ids = sc.scan_many(queries, k=3)
    for qi in (0, 3, 4):
        v0, i0 = sc.topk(queries[qi], 3)
        np.testing.assert_array_equal(vals[qi], v0)
        np.testing.assert_array_equal(ids[qi], i0)


def test_pallas_single_device_routing(monkeypatch):
    """The full single-device Pallas routing (the real-TPU code path) in
    interpret mode: every metric route, weighted reductions, and the
    cutoff mask."""
    from jax.sharding import Mesh
    from rapidfuzz_tpu.distance import (indel as indel_mod, jaro as jaro_mod,
                                        osa as osa_mod)
    from rapidfuzz_tpu.distance.levenshtein import WeightTable

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    corpus = ["sitting", "mitten", "kitchen", "apple", ""]
    for metric, mod in [("levenshtein", lev), ("osa", osa_mod),
                        ("indel", indel_mod), ("jaro", jaro_mod)]:
        sc = CorpusScanner(corpus, metric=metric, mesh=m1, bucket=32)
        assert sc._pallas and sc._ndev == 1
        d = sc.distances("kitten")
        for s, g in zip(corpus, d):
            assert g == mod.distance("kitten", s), (metric, s)
    # weighted route (wlev kernel) + algebraic reduction + cutoff mask
    w = WeightTable(1, 2, 3)
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1, bucket=32,
                       weights=w)
    d = sc.distances("kitten")
    for s, g in zip(corpus, d):
        assert g == lev.distance("kitten", s, weights=w), s
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1, bucket=32)
    res = sc.distances("kitten", score_cutoff=2)
    assert res.tolist() == [lev.distance("kitten", s, score_cutoff=2)
                            for s in corpus]


def test_damerau_pallas_routing(monkeypatch):
    """The lane-column Damerau Pallas kernel through the scanner
    (interpret mode), including a unicode corpus (no byte restriction)."""
    from jax.sharding import Mesh
    from rapidfuzz_tpu.distance import damerau_levenshtein as dam

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    corpus = ["abaa", "baaa", "CA", "", "Петрунко", "kitten", "ktiten"]
    sc = CorpusScanner(corpus, metric="damerau_levenshtein", mesh=m1,
                       bucket=32)
    assert sc._dam_pallas
    for query in ["aaaa", "AC", "Иванко", "kitten"]:
        d = sc.distances(query)
        for s, g in zip(corpus, d):
            assert g == dam.distance(query, s), (query, s, g)
    vals, ids = sc.topk("kitten", k=2)
    assert corpus[ids[0]] == "kitten" and vals[0] == 0
    assert corpus[ids[1]] == "ktiten" and vals[1] == 1   # transposition


def test_pallas_mesh_composition(mesh, monkeypatch):
    """Pallas kernels under shard_map over the 8-device mesh (interpret
    mode stands in for multi-chip hardware)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(2)
    corpus = ["".join(chr(97 + c) for c in rng.integers(0, 26, int(l)))
              for l in rng.integers(1, 30, 64)]
    corpus += ["kitten", ""]
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh, bucket=32)
    assert sc._pallas and sc._ndev == 8
    d = sc.distances("kitten")
    for i in list(range(0, len(corpus), 7)) + [len(corpus) - 2,
                                               len(corpus) - 1]:
        assert d[i] == lev.distance("kitten", corpus[i]), (i, corpus[i])
    vals, ids = sc.topk("kitten", k=2)
    assert corpus[ids[0]] == "kitten" and vals[0] == 0

    sc2 = CorpusScanner(corpus, metric="indel", mesh=mesh, bucket=32)
    from rapidfuzz_tpu.distance import indel as indel_mod
    d2 = sc2.distances("kitten")
    for i in range(0, len(corpus), 9):
        assert d2[i] == indel_mod.distance("kitten", corpus[i])

    from rapidfuzz_tpu.distance import jaro as jaro_mod
    sc3 = CorpusScanner(corpus, metric="jaro", mesh=mesh, bucket=32)
    d3 = sc3.distances("kitten")
    for i in range(0, len(corpus), 11):
        assert d3[i] == jaro_mod.distance("kitten", corpus[i]), (i, corpus[i])


def test_multihost_single_process(mesh):
    """The multi-host runner degenerates to a single-process sharded scan
    on the virtual mesh (the real 2-host config shares this code path)."""
    from rapidfuzz_tpu.parallel.multihost import global_scan_bench

    stats = global_scan_bench(corpus_size=1024, length=16, iters=2)
    assert stats["hosts"] == 1 and stats["devices"] == 8
    assert stats["corpus"] == 1024
    assert stats["pairs_per_s"] > 0


def test_extract():
    choices = ["kitten", "sitting", "mitten", "bitten", "xyz"]
    res = extract("kitten", choices, limit=3)
    assert res[0][0] == "kitten" and res[0][1] == pytest.approx(1.0)
    assert res[1][0] in ("mitten", "bitten")
    one = extract_one("kitten", choices)
    assert one[0] == "kitten"
    none = extract_one("kitten", ["xyz"], score_cutoff=0.9)
    assert none is None


def test_cdist():
    qs = ["abc", "xyz"]
    cs = ["abc", "abd", "zzz"]
    r = cdist(qs, cs, scorer="levenshtein", score_kind="distance")
    np.testing.assert_array_equal(r.values, [[0, 1, 3], [3, 3, 2]])
    r2 = cdist(qs, cs, scorer="jaro")
    assert r2.values[0, 0] == 1.0


def test_cdist_scanner_path_matches_scalar():
    """The CorpusScanner-backed many-vs-many path must agree with the
    scalar API for every score kind and metric family."""
    from rapidfuzz_tpu.distance import (damerau_levenshtein, jaro_winkler,
                                        levenshtein)

    qs = ["kitten", "abc", ""]
    cs = ["sitting", "mitten", "abd", "", "kitten"]
    for sk in ("distance", "similarity", "normalized_distance",
               "normalized_similarity"):
        r = cdist(qs, cs, scorer="levenshtein", score_kind=sk)
        for i, q in enumerate(qs):
            for j, c in enumerate(cs):
                assert r.values[i, j] == pytest.approx(
                    getattr(levenshtein, sk)(q, c), abs=1e-12), (sk, q, c)
    r = cdist(qs, cs, scorer="jaro_winkler")
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert r.values[i, j] == jaro_winkler.similarity(q, c)
    r = cdist(qs, cs, scorer="damerau_levenshtein", score_kind="distance")
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert r.values[i, j] == damerau_levenshtein.distance(q, c)


def test_wide_alphabet_pallas_routing(monkeypatch):
    """Unicode (chars >= 256) corpora ride the Pallas kernels via the
    query-local remap (``lev_kernel.remap_pack``; the reference keeps
    wide alphabets first-class via PM overflow hashmaps,
    ``pattern_match_vector.rs:104-155``) — single device and 8-device
    mesh, every Pallas metric route."""
    from jax.sharding import Mesh
    from rapidfuzz_tpu.distance import (indel as indel_mod, jaro as jaro_mod,
                                        osa as osa_mod)

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(7)
    # Cyrillic + CJK + ASCII mixed corpus
    pools = [(0x410, 0x44F), (0x4E00, 0x4E80), (97, 122)]
    corpus = []
    for i in range(30):
        lo, hi = pools[i % 3]
        corpus.append("".join(chr(c) for c in
                              rng.integers(lo, hi, rng.integers(1, 28))))
    corpus += ["Иванко", "Петрунко", "kitten", ""]
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    for metric, mod in [("levenshtein", lev), ("osa", osa_mod),
                        ("indel", indel_mod), ("jaro", jaro_mod)]:
        sc = CorpusScanner(corpus, metric=metric, mesh=m1, bucket=32)
        assert sc._pallas and sc._wide, metric
        for query in ["Иванко", "kitten", "不丁丙", ""]:
            d = sc.distances(query)
            for i in range(0, len(corpus), 5):
                assert d[i] == mod.distance(query, corpus[i]), \
                    (metric, query, corpus[i])

    # 8-device mesh route
    mesh8 = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh8, bucket=32)
    assert sc._pallas and sc._wide and sc._ndev == 8
    d = sc.distances("Иванко")
    for i in range(len(corpus)):
        assert d[i] == lev.distance("Иванко", corpus[i]), corpus[i]

    # > 127 distinct query symbols -> XLA fallback, same results
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1, bucket=32)
    big_q = "".join(chr(0x410 + (i % 64)) + chr(0x4E00 + i) for i in range(80))
    from rapidfuzz_tpu.ops.pallas import lev_kernel as _lk
    assert _lk.query_vocab(np.array([ord(c) for c in big_q])) is None
    d = sc.distances(big_q)
    for i in range(0, len(corpus), 7):
        assert d[i] == lev.distance(big_q, corpus[i]), corpus[i]

    # weighted route through the remap
    from rapidfuzz_tpu.distance.levenshtein import WeightTable
    w = WeightTable(1, 2, 3)
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1, bucket=32,
                       weights=w)
    d = sc.distances("Иванко")
    for i in range(0, len(corpus), 5):
        assert d[i] == lev.distance("Иванко", corpus[i], weights=w)


def test_stream_scanner_routing(monkeypatch):
    """Buckets > 1024 route to the streaming Pallas kernel through the
    scanner (previously they dropped to the XLA path)."""
    from jax.sharding import Mesh

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(11)
    base = "".join(chr(97 + c) for c in rng.integers(0, 26, 1200))
    corpus = [base,
              base[:600] + "xyz" + base[603:],
              base[:300] + base[310:],        # 10-char deletion
              "short", ""]
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1)
    assert sc._pallas and sc._stream and sc._LB == 2048
    q = base[:64]        # typical use: short query, long candidates
    d = sc.distances(q)
    for s, g in zip(corpus, d):
        assert g == lev.distance(q, s), (s[:20], g)

    # indel rides the streamed LCS kernel on the same buckets
    from rapidfuzz_tpu.distance import indel as indel_mod
    sc2 = CorpusScanner(corpus, metric="indel", mesh=m1)
    assert sc2._pallas and sc2._stream
    d2 = sc2.distances(q)
    for s, g in zip(corpus, d2):
        assert g == indel_mod.distance(q, s), (s[:20], g)

    # OSA rides its streamed kernel (transposition history carried
    # across chunks) on the same buckets
    from rapidfuzz_tpu.distance import osa as osa_mod
    swapped = base[:700] + base[701] + base[700] + base[702:]
    sc_osa = CorpusScanner(corpus + [swapped], metric="osa", mesh=m1)
    assert sc_osa._pallas and sc_osa._stream
    d_osa = sc_osa.distances(q)
    for s, g in zip(corpus + [swapped], d_osa):
        assert g == osa_mod.distance(q, s), (s[:20], g)

    # and over the 8-device mesh
    mesh8 = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    sc3 = CorpusScanner(corpus, metric="lcs_seq", mesh=mesh8)
    assert sc3._pallas and sc3._stream and sc3._ndev == 8
    from rapidfuzz_tpu.distance import lcs_seq as lcs_mod
    d3 = sc3.distances(q)
    for s, g in zip(corpus, d3):
        assert g == lcs_mod.distance(q, s), (s[:20], g)
    sc4 = CorpusScanner(corpus, metric="osa", mesh=mesh8)
    assert sc4._pallas and sc4._stream and sc4._ndev == 8
    d4 = sc4.distances(q)
    for s, g in zip(corpus, d4):
        assert g == osa_mod.distance(q, s), (s[:20], g)


def test_jaro_stream_scanner_routing(monkeypatch):
    """jaro/jaro_winkler buckets in (1024, 4096] stream through the Jaro
    chunk kernel (previously XLA fallback); f64 finish unchanged."""
    from jax.sharding import Mesh
    from rapidfuzz_tpu.distance import jaro as jaro_mod
    from rapidfuzz_tpu.distance import jaro_winkler as jw_mod

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(23)
    base = "".join(chr(97 + c) for c in rng.integers(0, 8, 1400))
    corpus = [base, base[:700] + base[701] + base[700] + base[702:],
              base[:1100], "short", ""]
    q = base[:48]
    for metric, mod in [("jaro", jaro_mod), ("jaro_winkler", jw_mod)]:
        m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
        sc = CorpusScanner(corpus, metric=metric, mesh=m1)
        assert sc._pallas and sc._stream and sc._LB == 2048
        d = sc.distances(q)
        for s, g in zip(corpus, d):
            assert abs(g - mod.distance(q, s)) < 1e-12, (metric, s[:20])
    # sharded form over the 8-device mesh
    mesh8 = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    sc8 = CorpusScanner(corpus, metric="jaro", mesh=mesh8)
    assert sc8._stream and sc8._ndev == 8
    d8 = sc8.distances(q)
    for s, g in zip(corpus, d8):
        assert abs(g - jaro_mod.distance(q, s)) < 1e-12, s[:20]


def test_wlev_stream_scanner_routing(monkeypatch):
    """Weighted Levenshtein buckets > 1024 stream the DP row across text
    chunks (wlev_stream); queries beyond the row-scratch cap fall back to
    the XLA scan on the unpacked packed corpus."""
    from jax.sharding import Mesh
    from rapidfuzz_tpu.distance.levenshtein import WeightTable

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(29)
    base = "".join(chr(97 + c) for c in rng.integers(0, 10, 1200))
    corpus = [base, base[:600] + "zz" + base[602:], base[:200], "ab", ""]
    w = WeightTable(2, 3, 5)
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1, weights=w)
    assert sc._pallas and sc._stream
    q = base[:40]
    d = sc.distances(q)
    for s, g in zip(corpus, d):
        assert g == lev.distance(q, s, weights=w), (s[:20], g)
    # over-cap query (> 256 chars) -> XLA fallback, same results
    q2 = base[:300]
    d2 = sc.distances(q2)
    for s, g in zip(corpus, d2):
        assert g == lev.distance(q2, s, weights=w), (s[:20], g)
    # sharded form
    mesh8 = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    sc8 = CorpusScanner(corpus, metric="levenshtein", mesh=mesh8,
                        weights=w)
    assert sc8._stream and sc8._ndev == 8
    d8 = sc8.distances(q)
    for s, g in zip(corpus, d8):
        assert g == lev.distance(q, s, weights=w), (s[:20], g)


def test_hint_ladder_scan(monkeypatch):
    """score_hint routes the two-pass banded-then-compact scan and never
    changes results (hint contract, ``levenshtein.rs:2153-2160``)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from jax.sharding import Mesh

    rng = np.random.default_rng(31)
    q = "".join(chr(97 + c) for c in rng.integers(0, 6, 64))
    corpus = []
    for _ in range(600):            # mostly near the query (inside hint)
        s = list(q)
        for _ in range(int(rng.integers(0, 5))):
            s[rng.integers(0, 64)] = chr(97 + rng.integers(0, 6))
        corpus.append("".join(s))
    for _ in range(100):            # far beyond any hint (stragglers)
        corpus.append("".join(chr(110 + c)
                              for c in rng.integers(0, 6,
                                                    rng.integers(10, 90))))
    corpus += ["", q]
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1)
    base = sc.distances(q)
    for hint in (4, 15, 31, 200, 0):
        got = sc.distances(q, score_hint=hint)
        np.testing.assert_array_equal(got, base), hint
    # hint composes with an explicit cutoff path untouched
    res = sc.distances(q, score_cutoff=3, score_hint=5)
    exp = sc.distances(q, score_cutoff=3)
    np.testing.assert_array_equal(res.values[res.valid],
                                  exp.values[exp.valid])


def test_multihost_two_process_cpu():
    """REAL 2-process jax.distributed run (CPU backend, gloo collectives):
    each process holds only its corpus shard; the planted exact match
    lives on process 0 only, so both processes reporting top1 == 0 proves
    the cross-process top-k merge (BASELINE's 2-host config, validated
    without TPU hardware)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # strip the axon plugin: its get_backend hook would dial the TPU
    # tunnel during distributed init
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port = 19600 + (os.getpid() % 200)
    args = [sys.executable, "-m", "rapidfuzz_tpu.parallel.multihost",
            f"--coordinator=127.0.0.1:{port}", "--num-processes=2",
            "--corpus-size=16384", "--iters=2", "--platform", "cpu"]
    p1 = subprocess.Popen(args + ["--process-id=1"], env=env,
                          stdout=subprocess.PIPE, text=True)
    try:
        p0 = subprocess.run(args + ["--process-id=0"], env=env,
                            capture_output=True, text=True, timeout=240)
        out1, _ = p1.communicate(timeout=240)
    finally:
        p1.kill()
    s0 = json.loads([l for l in p0.stdout.splitlines()
                     if l.startswith("{")][-1])
    s1 = json.loads([l for l in out1.splitlines() if l.startswith("{")][-1])
    for s in (s0, s1):
        assert s["hosts"] == 2 and s["devices"] == 8
        assert s["top1"] == 0.0          # planted match, found across DCN
        assert s["corpus"] == 16384


def test_topk_auto_band(monkeypatch):
    """Without a cutoff, topk first tries the banded kernel; results must
    equal the full-scan top-k both when the band suffices (near matches)
    and when it falls through (all candidates far away)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from jax.sharding import Mesh

    rng = np.random.default_rng(33)
    q = "".join(chr(97 + c) for c in rng.integers(0, 6, 64))
    near = []
    for _ in range(40):
        s = list(q)
        for _ in range(int(rng.integers(0, 6))):
            s[rng.integers(0, 64)] = chr(97 + rng.integers(0, 6))
        near.append("".join(s))
    far = ["".join(chr(110 + c) for c in rng.integers(0, 6, 64))
           for _ in range(30)]
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))

    sc = CorpusScanner(near + far, metric="levenshtein", mesh=m1)
    assert sc._band_auto_cut(q) == 15
    vals, ids = sc.topk(q, k=5)           # band pass suffices
    d_all = sc.distances(q)
    exp_ids = sc._topk_host(np.asarray(d_all, np.float64),
                            np.arange(len(near) + len(far)), 5)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_array_equal(vals, np.asarray(d_all)[ids])

    sc2 = CorpusScanner(far, metric="levenshtein", mesh=m1)
    vals2, ids2 = sc2.topk(q, k=5)        # fallback: nothing under band
    d2 = sc2.distances(q)
    exp2 = sc2._topk_host(np.asarray(d2, np.float64),
                          np.arange(len(far)), 5)
    np.testing.assert_array_equal(ids2, exp2)
    np.testing.assert_array_equal(vals2, np.asarray(d2)[ids2])


def test_damerau_long_scanner(monkeypatch):
    """Damerau corpora of 128 < LB <= 512 chars ride the multi-block
    lane-column kernel (previously the XLA path)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from jax.sharding import Mesh
    from rapidfuzz_tpu.distance import damerau_levenshtein as dl

    rng = np.random.default_rng(43)
    base = "".join(chr(97 + c) for c in rng.integers(0, 6, 300))
    swapped = base[:150] + base[151] + base[150] + base[152:]
    corpus = [base, swapped, base[:40], "", base[:299] + "z"]
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    sc = CorpusScanner(corpus, metric="damerau_levenshtein", mesh=m1)
    assert sc._dam_pallas and sc._dam_long
    q = base[:64]
    d = sc.distances(q)
    for s, g in zip(corpus, d):
        assert g == dl.distance(q, s), (s[:20], g)
    vals, ids = sc.topk(q, k=2)
    assert corpus[ids[0]] == base[:64] or vals[0] == dl.distance(
        q, corpus[ids[0]])


def test_damerau_sharded_mesh(mesh, monkeypatch):
    """Damerau rides the lane-column kernels on multi-device meshes
    (short and long forms, rows sharded over the data axis)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.distance import damerau_levenshtein as dl

    rng = np.random.default_rng(47)
    corpus = ["abcd", "abdc", "xxxx", "ab", "", "badc"] * 50
    sc = CorpusScanner(corpus, metric="damerau_levenshtein", mesh=mesh,
                       bucket=32)
    assert sc._dam_pallas and sc._ndev == 8 and not sc._dam_long
    d = sc.distances("abcd")
    for s, g in zip(corpus, d):
        assert g == dl.distance("abcd", s), (s, g)

    base = "".join(chr(97 + c) for c in rng.integers(0, 6, 200))
    swapped = base[:90] + base[91] + base[90] + base[92:]
    corpus2 = [base, swapped, base[:10], ""] * 4
    sc2 = CorpusScanner(corpus2, metric="damerau_levenshtein", mesh=mesh)
    assert sc2._dam_pallas and sc2._dam_long and sc2._ndev == 8
    q = base[:48]
    d2 = sc2.distances(q)
    for s, g in zip(corpus2, d2):
        assert g == dl.distance(q, s), (s[:20], g)


def test_cdist_grouped_dispatches(mesh, monkeypatch):
    """cdist with several queries rides scan_many's grouped multi-query
    dispatches and matches the per-query scan exactly."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from jax.sharding import Mesh

    corpus = ["apple", "apply", "ape", "maple", "orange", "grape", ""] * 8
    queries = ["apple", "grape", "", "zzz"]
    m1 = Mesh(np.array(jax.devices("cpu")[:1]), ("data",))
    # route through a single-device scanner (the nq kernel path)
    from rapidfuzz_tpu.models import process as proc
    from rapidfuzz_tpu.parallel.scan import CorpusScanner
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=m1)
    got = proc._scanner_scores("levenshtein", queries, corpus,
                               "distance", scanner=sc)
    for qi, q in enumerate(queries):
        exp = [lev.distance(q, s) for s in corpus]
        np.testing.assert_array_equal(got[qi], exp), q

    # indel / lcs_seq ride the lcs nq kernel (sim -> distance finish on
    # host lengths); a 33-char query forces a second W group
    from rapidfuzz_tpu.distance import indel as indel_mod
    from rapidfuzz_tpu.distance import lcs_seq as lcs_mod
    queries2 = queries + ["a" * 33]
    for metric, mod in [("indel", indel_mod), ("lcs_seq", lcs_mod)]:
        sc = CorpusScanner(corpus, metric=metric, mesh=m1)
        assert sc._nq_eligible()
        got = np.asarray(sc.scan_many(queries2))
        for qi, q in enumerate(queries2):
            exp = [mod.distance(q, s) for s in corpus]
            np.testing.assert_array_equal(got[qi], exp), (metric, q)

    # osa / jaro / jaro_winkler nq forms (short queries: the jaro
    # interpret body is flat and slow, keep one W group)
    from rapidfuzz_tpu.distance import jaro as jaro_mod
    from rapidfuzz_tpu.distance import jaro_winkler as jw_mod
    from rapidfuzz_tpu.distance import osa as osa_mod
    sc = CorpusScanner(corpus, metric="osa", mesh=m1)
    assert sc._nq_eligible()
    got = np.asarray(sc.scan_many(queries))
    for qi, q in enumerate(queries):
        exp = [osa_mod.distance(q, s) for s in corpus]
        np.testing.assert_array_equal(got[qi], exp), q
    for metric, mod in [("jaro", jaro_mod), ("jaro_winkler", jw_mod)]:
        sc = CorpusScanner(corpus, metric=metric, mesh=m1)
        assert sc._nq_eligible()
        got = np.asarray(sc.scan_many(queries))
        for qi, q in enumerate(queries):
            exp = np.array([1.0 - mod.similarity(q, s) for s in corpus])
            assert np.abs(got[qi] - exp).max() < 1e-12, (metric, q)


def test_partial_ratio_scanner_routing(monkeypatch):
    """CorpusScanner(metric="partial_ratio"): the windowed Pallas kernel
    route, the host fallback route, the wide-alphabet remap route and an
    8-device mesh all reproduce scalar ``fuzz.partial_ratio`` exactly
    (distance = 1 - best-window ratio)."""
    from jax.sharding import Mesh
    from rapidfuzz_tpu import fuzz
    from rapidfuzz_tpu.parallel.scan import CorpusScanner

    rng = np.random.default_rng(21)
    letters = list("abcdefg")
    corpus = ["".join(rng.choice(letters, int(n)))
              for n in rng.integers(0, 40, 120)] + ["", "needle here"]
    q = "needle"
    exp = np.array([fuzz.partial_ratio(q, c) for c in corpus])

    # host (non-pallas) route
    sc_host = CorpusScanner(corpus, metric="partial_ratio")
    np.testing.assert_array_equal(1.0 - sc_host.distances(q), exp)

    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    # windowed-kernel route (+ cutoff masking in distance space)
    sc = CorpusScanner(corpus, metric="partial_ratio")
    d = sc.distances(q)
    np.testing.assert_array_equal(1.0 - d, exp)
    r = sc.distances(q, score_cutoff=0.25)
    assert (r.valid == (d <= 0.25)).all()
    # query longer than the kernel cap -> host path, same answers
    lq = "".join(rng.choice(letters, 80))
    exp_l = np.array([fuzz.partial_ratio(lq, c) for c in corpus])
    assert np.abs((1.0 - sc.distances(lq)) - exp_l).max() < 1e-12
    # empty query
    np.testing.assert_array_equal(
        1.0 - sc.distances(""),
        [1.0 if len(c) == 0 else 0.0 for c in corpus])

    # wide alphabet -> query-local remap route
    wide = ["".join(chr(c) for c in rng.integers(0x410, 0x44F,
                                                 rng.integers(1, 25)))
            for _ in range(40)] + ["Иванко", ""]
    wq = "Петрунко"
    exp_w = np.array([fuzz.partial_ratio(wq, c) for c in wide])
    sc_w = CorpusScanner(wide, metric="partial_ratio")
    np.testing.assert_array_equal(1.0 - sc_w.distances(wq), exp_w)

    # 8-device mesh (sharded nouts=2 kernel)
    mesh8 = Mesh(np.array(jax.devices("cpu")), ("data",))
    sc_m = CorpusScanner(corpus, metric="partial_ratio", mesh=mesh8)
    np.testing.assert_array_equal(1.0 - sc_m.distances(q), exp)

    # process integration: extract over the scanner metric
    from rapidfuzz_tpu.models import extract
    hits = extract(q, corpus, scorer="partial_ratio", limit=3)
    assert hits[0][1] == exp.max()


def test_banded_stream_scanner(monkeypatch):
    """score_cutoff <= 47 rides the streamed band kernel on long
    (>1024-char) buckets (band_kernel._stream_kernel: band register in
    VMEM scratch across text chunks, pre-funneled tables streamed
    chunk-by-chunk) — the reference's O(ceil(K/64)*M) cutoff asymptotics
    (levenshtein.rs:48) at stream lengths."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(23)
    letters = list("abcdef")
    q = "".join(rng.choice(letters, 200))
    corpus = []
    for i in range(48):
        k = i % 3
        if k == 0:          # near-misses (results under the cutoff)
            c = list(q)
            for _ in range(int(rng.integers(0, 25))):
                c[int(rng.integers(len(c)))] = rng.choice(letters)
            corpus.append("".join(c))
        elif k == 1:        # far candidates, arbitrary lengths
            corpus.append("".join(rng.choice(
                letters, int(rng.integers(0, 1400)))))
        else:               # query + suffix
            corpus.append(q + "".join(rng.choice(
                letters, int(rng.integers(0, 30)))))
    sc = CorpusScanner(corpus, metric="levenshtein", bucket=1536)
    assert sc._stream
    exp = np.array([lev.distance(q, c) for c in corpus])
    for cutoff in (9, 20, 47):      # bw = 1, 2, 3
        r = sc.distances(q, score_cutoff=cutoff)
        under = exp <= cutoff
        np.testing.assert_array_equal(r.valid, under, err_msg=str(cutoff))
        np.testing.assert_array_equal(r.values[under], exp[under])


def test_banded_stream_sharded(monkeypatch, mesh):
    """The streamed band composes with the 8-device mesh (per-shard
    _run_stream via shard_map; shifted tables replicated)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(29)
    letters = list("abcd")
    q = "".join(rng.choice(letters, 180))
    corpus = []
    for i in range(32):
        if i % 2:
            c = list(q)
            for _ in range(int(rng.integers(0, 12))):
                c[int(rng.integers(len(c)))] = rng.choice(letters)
            corpus.append("".join(c))
        else:
            corpus.append("".join(rng.choice(
                letters, int(rng.integers(0, 1200)))))
    exp = np.array([lev.distance(q, c) for c in corpus])
    sc = CorpusScanner(corpus, metric="levenshtein", mesh=mesh,
                       bucket=1536)
    assert sc._stream
    r = sc.distances(q, score_cutoff=10)
    under = exp <= 10
    np.testing.assert_array_equal(r.valid, under)
    np.testing.assert_array_equal(r.values[under], exp[under])


def test_hint_ladder_stream(monkeypatch):
    """score_hint on long (>1024-char) buckets rides the streamed band
    then a compacted full-stream pass; results identical for any hint
    (the levenshtein.rs:2153-2160 contract)."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    rng = np.random.default_rng(43)
    letters = list("abcd")
    q = "".join(rng.choice(letters, 180))
    corpus = []
    for i in range(24):
        if i % 2:
            c = list(q)
            for _ in range(int(rng.integers(0, 12))):
                c[int(rng.integers(len(c)))] = rng.choice(letters)
            corpus.append("".join(c))
        else:
            corpus.append("".join(rng.choice(
                letters, int(rng.integers(0, 1200)))))
    exp = np.array([lev.distance(q, c) for c in corpus])
    sc = CorpusScanner(corpus, metric="levenshtein", bucket=1536)
    assert sc._stream
    for hint in (5, 40, 10 ** 6):
        np.testing.assert_array_equal(sc.distances(q, score_hint=hint),
                                      exp, err_msg=str(hint))


def test_bucketed_scanner(monkeypatch):
    """BucketedScanner splits heterogeneous corpora into length classes
    (one device scanner each) and merges results in corpus order;
    distances/topk/scan_many match the flat scanner exactly, incl. the
    deterministic top-k tie-break."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.parallel import BucketedScanner

    rng = np.random.default_rng(51)
    letters = list("abcdef")
    corpus = ([
        "".join(rng.choice(letters, int(n)))
        for n in rng.integers(0, 30, 100)]
        + ["".join(rng.choice(letters, int(n)))
           for n in rng.integers(100, 250, 30)] + [""])
    q = "".join(rng.choice(letters, 24))
    exp = np.array([lev.distance(q, c) for c in corpus])
    bs = BucketedScanner(corpus, metric="levenshtein", min_split=16)
    assert len(bs.classes) == 2
    np.testing.assert_array_equal(bs.distances(q), exp)
    r = bs.distances(q, score_cutoff=20)
    assert (r.valid == (exp <= 20)).all()
    flat = CorpusScanner(corpus, metric="levenshtein")
    v1, i1 = bs.topk(q, 7)
    v2, i2 = flat.topk(q, 7)
    np.testing.assert_array_equal(v1, np.asarray(v2, np.float64))
    np.testing.assert_array_equal(i1, i2)
    qs = [q, "", "abcdef"]
    v, i = bs.scan_many(qs, k=5)
    for qi, qq in enumerate(qs):
        fv, fi = flat.topk(qq, 5)
        np.testing.assert_array_equal(v[qi][:len(fv)],
                                      np.asarray(fv, np.float64))
        np.testing.assert_array_equal(i[qi][:len(fi)], fi)
    # homogeneous corpus collapses to one child
    assert len(BucketedScanner(["abc"] * 50, min_split=16).classes) == 1


def test_topk_empty_and_small_corpus(monkeypatch):
    """k clamps to the corpus size: empty corpora return empty results
    (regression: padding rows surfaced as int64-min garbage), and n < k
    returns exactly n entries on every route."""
    sc = CorpusScanner([], metric="levenshtein")
    v, i = sc.topk("abc", 3)
    assert v.size == 0 and i.size == 0
    assert sc.distances("abc").size == 0
    sc2 = CorpusScanner(["ab"], metric="levenshtein")
    v, i = sc2.topk("abc", 3)
    assert list(i) == [0] and v[0] == lev.distance("abc", "ab")
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    sc3 = CorpusScanner(["ab"], metric="levenshtein")
    v, i = sc3.topk("abc", 3)
    assert list(i) == [0] and v[0] == lev.distance("abc", "ab")
    from rapidfuzz_tpu.parallel import BucketedScanner
    bs = BucketedScanner([], metric="levenshtein")
    v, i = bs.topk("abc", 3)
    assert v.size == 0 and bs.distances("abc").size == 0
