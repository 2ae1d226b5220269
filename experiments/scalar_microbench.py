"""Scalar one-shot latency sweep, lengths 2-128 (host oracle path).

Mirrors the reference's criterion benches (random alphanumeric strings,
lengths 2-128 step 2, ``rapidfuzz-benches/benches/bench_levenshtein.rs:
27-63``) so the scalar API's "competitive" claim carries numbers.  The
reference's published charts put its one-shot Levenshtein at ~1-2 us and
indel/LCS at ~50-500 ns on unspecified CPU hardware (BASELINE.md).

Run anywhere (host-only):  python experiments/scalar_microbench.py
Emits one JSON line per metric with ns/call at each probed length.
"""

import json
import os
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapidfuzz_tpu import fuzz                          # noqa: E402
from rapidfuzz_tpu.distance import (damerau_levenshtein, indel,  # noqa: E402
                                    jaro, jaro_winkler, lcs_seq,
                                    levenshtein, osa)

LENS = (2, 8, 16, 32, 64, 96, 128)
ALNUM = string.ascii_letters + string.digits


def _pairs(rng, n, count=64):
    # str pairs: the reference's bench input class, and the API's common
    # case (rides the in-process C fast path, native/rf_scalar.cpp)
    out = []
    for _ in range(count):
        a = "".join(ALNUM[i] for i in rng.integers(0, len(ALNUM), n))
        b = "".join(ALNUM[i] for i in rng.integers(0, len(ALNUM), n))
        out.append((a, b))
    return out


def _time_ns(fn, pairs, budget_s=0.1, windows=3):
    # warm
    for a, b in pairs[:4]:
        fn(a, b)
    # best of `windows` independent windows: one-shot windows were ±2x
    # run-to-run on the shared 4-core host (criterion-style discipline,
    # rapidfuzz-benches/benches/bench_levenshtein.rs:27-63)
    best = float("inf")
    for _ in range(windows):
        n = 0
        t0 = time.perf_counter()
        while True:
            for a, b in pairs:
                fn(a, b)
            n += len(pairs)
            dt = time.perf_counter() - t0
            if dt > budget_s:
                break
        best = min(best, dt / n * 1e9)
    return best


def main():
    rng = np.random.default_rng(42)
    metrics = {
        "levenshtein": levenshtein.distance,
        "levenshtein_cutoff2": (lambda a, b:
                                levenshtein.distance(a, b, score_cutoff=2)),
        "indel": indel.distance,
        "indel_cutoff3": (lambda a, b:
                          indel.distance(a, b, score_cutoff=3)),
        "lcs_seq": lcs_seq.distance,
        # distance cutoff 2 == miss budget 4 at equal lengths (the
        # reference's max_misses < 5 gate, lcs_seq.rs:488-532); cutoff 3
        # maps to 6 misses and correctly stays on the full bp pass
        "lcs_seq_cutoff2": (lambda a, b:
                            lcs_seq.distance(a, b, score_cutoff=2)),
        "osa": osa.distance,
        "damerau_levenshtein": damerau_levenshtein.distance,
        "jaro": jaro.similarity,
        "jaro_winkler": jaro_winkler.similarity,
        "fuzz_ratio": fuzz.ratio,
    }
    for name, fn in metrics.items():
        row = {}
        for n in LENS:
            pairs = _pairs(rng, n)
            row[str(n)] = round(_time_ns(fn, pairs))
        print(json.dumps({"metric": name, "ns_per_call": row}), flush=True)


if __name__ == "__main__":
    main()
