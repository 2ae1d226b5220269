"""Banded LCS/indel kernel conformance (interpret mode).

Contract (``indel.rs:80-104`` -> ``lcs_seq.rs:267-341``): similarities are
exact for candidates whose indel distance is within the cutoff band;
out-of-band candidates come back with an indel overestimate, so the
caller's cutoff mask accepts exactly the true <= cutoff set.
"""

import numpy as np
import pytest

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops.pallas import lcs_band_kernel as lbk
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk


def _mutated_corpus(rng, q, B, LB, max_edits=8):
    import jax.numpy as jnp

    chars = np.full((B, LB), -1, np.int32)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        arr = list(q)
        for _ in range(int(rng.integers(0, max_edits))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(len(arr), 1)))
            if op == 0 and arr:
                arr[pos] = int(rng.integers(97, 123))
            elif op == 1 and arr:
                del arr[pos]
            else:
                arr.insert(pos, int(rng.integers(97, 123)))
        arr = arr[:LB]
        lens[i] = len(arr)
        chars[i, :len(arr)] = arr
    return chars, lens, jnp.asarray(chars), jnp.asarray(lens)


@pytest.mark.parametrize("LB,cutoff", [(64, 5), (128, 15), (256, 47)])
def test_lcs_band_kernel_vs_oracle(rng, LB, cutoff):
    B = 128
    la = int(rng.integers(LB // 2, LB + 20))
    q = rng.integers(97, 123, la).astype(np.int32)
    chars, lens, cj, lj = _mutated_corpus(rng, q, B, LB)
    cand3, lb2 = lk.prepare_corpus(cj, lj, LB=LB)
    sim = np.asarray(lbk.lcs_banded_1v_many(
        q, cand3, lb2, cutoff=cutoff, mode="byte", sub=1,
        interpret=True)).reshape(-1)
    for i in range(B):
        true_sim = oracle.lcs_seq(q.astype(np.int64),
                                  chars[i, :lens[i]].astype(np.int64))
        true_indel = la + lens[i] - 2 * true_sim
        got_indel = la + int(lens[i]) - 2 * int(sim[i])
        if true_indel <= cutoff:
            assert sim[i] == true_sim, (i, sim[i], true_sim)
        else:
            assert got_indel > cutoff, (i, got_indel, true_indel)


def test_lcs_band_stream_kernel(rng):
    """Streamed band (text chunks on a second grid axis): indel cutoffs
    at bucket lengths beyond the candidate-block VMEM budget."""
    B, LB = 128, 1024                    # 2 STREAM_CHUNKs
    la = 900
    q = rng.integers(97, 123, la).astype(np.int32)
    chars, lens, cj, lj = _mutated_corpus(rng, q, B, LB, max_edits=12)
    cand3, lb2 = lk.prepare_corpus(cj, lj, LB=LB)
    for cutoff in (15, 31):
        sim = np.asarray(lbk.lcs_banded_stream_1v_many(
            q, cand3, lb2, cutoff=cutoff, mode="byte", sub=1,
            interpret=True)).reshape(-1)
        for i in range(0, B, 9):
            true_sim = oracle.lcs_seq(q.astype(np.int64),
                                      chars[i, :lens[i]].astype(np.int64))
            true_indel = la + lens[i] - 2 * true_sim
            got_indel = la + int(lens[i]) - 2 * int(sim[i])
            if true_indel <= cutoff:
                assert sim[i] == true_sim, (i, sim[i], true_sim)
            else:
                assert got_indel > cutoff, (i, got_indel, true_indel)


def test_scanner_banded_indel_route(rng, monkeypatch):
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.parallel.scan import CorpusScanner

    # >= 256 chars so Wq >= 8 keeps the banded route selected (the
    # routing gate follows the measured crossover)
    q = "".join(chr(rng.integers(97, 123)) for _ in range(260))
    corpus = []
    for _ in range(200):
        arr = list(q)
        for _ in range(int(rng.integers(0, 10))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(len(arr), 1)))
            if op == 0 and arr:
                arr[pos] = chr(rng.integers(97, 123))
            elif op == 1 and arr:
                del arr[pos]
            else:
                arr.insert(pos, chr(rng.integers(97, 123)))
        corpus.append("".join(arr))
    corpus += ["z" * 70, "", q]
    enc = [np.frombuffer(c.encode(), np.uint8).astype(np.int64)
           for c in corpus]
    qe = np.frombuffer(q.encode(), np.uint8).astype(np.int64)

    # indel 47 -> bw=3, routable by default since the r4 retune
    for metric, cut in [("indel", 8), ("indel", 0), ("indel", 47),
                        ("lcs_seq", 6)]:
        sc = CorpusScanner(corpus, metric=metric)
        res = sc.distances(q, score_cutoff=cut)
        vals, valid = np.asarray(res.values), np.asarray(res.valid)
        for i, c in enumerate(enc):
            if metric == "indel":
                true = oracle.indel(qe, c)
            else:
                true = max(qe.size, c.size) - oracle.lcs_seq(qe, c)
            if true <= cut:
                assert valid[i] and vals[i] == true, (metric, cut, i)
            else:
                assert not valid[i], (metric, cut, i)


def test_fuzz_ratio_many_cutoff_banded(rng, monkeypatch):
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    import rapidfuzz_tpu.distance._int_metric as im
    monkeypatch.setattr(im, "SCAN_MIN", 4)     # force the scanner route
    from rapidfuzz_tpu import fuzz

    q = "the quick brown fox jumps over the lazy dog and keeps running"
    corpus = [q, q[:-3], q.replace("quick", "quack"),
              "completely different text here!", q + " tail", ""]
    plain = fuzz.ratio_many(q, corpus)
    cut = fuzz.ratio_many(q, corpus, score_cutoff=0.9)
    for i in range(len(corpus)):
        v = float(plain.values[i])
        if v >= 0.9:
            assert cut.valid[i] and abs(float(cut.values[i]) - v) < 1e-12
        else:
            assert not cut.valid[i]


def test_cdist_extract_cutoff_push(rng, monkeypatch):
    """cdist/extract push a score_cutoff into the scanner (banded route):
    valid entries and the accepted set are identical to the uncut run."""
    monkeypatch.setenv("RAPIDFUZZ_TPU_FORCE_PALLAS", "interpret")
    from rapidfuzz_tpu.models import cdist, extract

    q = "".join(chr(rng.integers(97, 123)) for _ in range(280))
    corpus = []
    for _ in range(40):
        arr = list(q)
        for _ in range(int(rng.integers(0, 10))):
            pos = int(rng.integers(0, len(arr)))
            arr[pos] = chr(rng.integers(97, 123))
        corpus.append("".join(arr))
    corpus += ["zzz" * 80, q]
    plain = cdist([q], corpus, scorer="indel")
    cut = cdist([q], corpus, scorer="indel", score_cutoff=0.97)
    for i in range(len(corpus)):
        v = float(plain.values[0][i])
        if v >= 0.97:
            assert cut.valid[0][i] and abs(float(cut.values[0][i]) - v) \
                < 1e-12
        else:
            assert not cut.valid[0][i]
    top = extract(q, corpus, scorer="indel", score_cutoff=0.97, limit=50)
    want = sorted(((float(plain.values[0][i]), i)
                   for i in range(len(corpus))
                   if plain.values[0][i] >= 0.97), key=lambda t: -t[0])
    assert [i for _, i in want] == [i for _, _, i in top] or \
        len(want) == len(top)     # stable-order ties may differ in index
