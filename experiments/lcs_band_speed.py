"""Hardware probe: banded LCS/indel kernel vs the full LCS kernel.

VERDICT round-3 gate: CorpusScanner(metric="indel") / fuzz.ratio scans
with a cutoff should run >= 1.5x the full kernel at 256-512 chars, with
results identical with/without the cutoff for in-band candidates.

Run on the TPU:  python experiments/lcs_band_speed.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rapidfuzz_tpu.ops.pallas import lcs_band_kernel as lbk
from rapidfuzz_tpu.ops.pallas import lcs_kernel as lck
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk


def _sync(out):
    # block_until_ready is NOT a reliable barrier through the axon
    # tunnel; a one-element device->host fetch is (see bench.py._rate)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, iters=5):
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    rng = np.random.default_rng(5)
    for LB, B in ((64, 1 << 20), (256, 1 << 18), (512, 1 << 17)):
        la = LB
        q = rng.integers(97, 123, la).astype(np.int32)
        chars = np.full((B, LB), -1, np.int32)
        lens = np.full(B, LB, np.int32)
        base = np.broadcast_to(q, (B, LB)).copy()
        nmut = rng.integers(0, 16, B)
        for i in range(0, B, 7):                 # mutate a sample only
            for _ in range(int(nmut[i])):
                base[i, rng.integers(0, LB)] = rng.integers(97, 123)
        chars[:, :LB] = base
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars),
                                       jnp.asarray(lens), LB=LB)
        cand3 = jax.block_until_ready(jax.device_put(cand3))

        # stage query tables ONCE (BatchComparator pattern) — the r3 run
        # of this probe rebuilt + uploaded the band tables inside the
        # timed window, polluting every crossover row (staging was ~4.8ms
        # of a ~7ms call at LB=512)
        staged_full = lk.stage_query(q, "local")
        tf, full = timeit(lambda: lck.lcs_1v_many(q, cand3, lb2,
                                                  mode="local",
                                                  staged=staged_full))
        full = np.asarray(full).reshape(-1)
        for cutoff in (15, 31, 47):
            stb = jax.block_until_ready(jnp.asarray(
                lbk.build_shifted_tables(q, "local", LB,
                                         lbk.band_words(cutoff))))
            tb, sim = timeit(lambda: lbk.lcs_banded_1v_many(
                q, cand3, lb2, cutoff=cutoff, mode="local", staged=stb))
            sim = np.asarray(sim).reshape(-1)
            indel = 2 * LB - 2 * full
            inband = indel <= cutoff
            exact = bool(np.array_equal(sim[inband], full[inband]))
            rej = bool(np.all(2 * LB - 2 * sim[~inband] > cutoff))
            print(json.dumps({
                "LB": LB, "B": B, "cutoff": cutoff,
                "full_ms": round(tf * 1e3, 2),
                "band_ms": round(tb * 1e3, 2),
                "speedup": round(tf / tb, 2),
                "inband": int(inband.sum()),
                "exact": exact, "reject_ok": rej,
            }), flush=True)


if __name__ == "__main__":
    main()
