"""Hardware probe: cutoff-banded LONG Damerau rate vs the full long kernel.

4096-char near-duplicate corpus (the long-dedup shape: |la-lb| <= k or
auto-reject), query = the base document.  The band touches
la * (2k+1) cells instead of la * lb — at 4096/k=7 that is ~1/273rd of
the full DP.

Run on the TPU:  python experiments/damerau_band_long_rate.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

LB = 4096
B = 4096            # pairs (2 sub*128 blocks at SEQ_SUB=16)


def main():
    rng = np.random.default_rng(21)
    base = rng.integers(97, 123, LB).astype(np.int32)
    chars = np.full((B, LB), -1, np.int32)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        c = base.copy()
        for _ in range(int(rng.integers(0, 12))):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, max(1, len(c) - 1)))
            if op == 0:
                c[p] = rng.integers(97, 123)
            elif op == 1 and p + 1 < len(c):
                c[p], c[p + 1] = c[p + 1], c[p]
            else:
                c = np.delete(c, p)
        chars[i, : len(c)] = c
        lens[i] = len(c)
    bc, lt, lbmax = dk.prepare_corpus_seq_long(chars, lens)
    bc = jax.block_until_ready(jax.device_put(bc))
    lt = jax.device_put(lt)
    stq = dk.stage_query_seq(base)

    # oracle spot-check through the banded kernel
    out = np.asarray(dk.damerau_seqband_long_1v_many(
        None, bc, lt, lbmax=lbmax, kband=7, staged=stq))
    for i in (0, 1, 17, B - 1):
        exp = oracle.damerau(base.astype(np.int64),
                             chars[i, : lens[i]].astype(np.int64))
        got = int(out[i])
        assert (got == exp) if exp <= 7 else (got > 7), (i, got, exp)
    print(json.dumps({"check": "band_long oracle-exact at k=7"}),
          flush=True)

    def rate(fn, n_iter=5):
        out = fn()
        np.asarray(out[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn()
            for _ in range(n_iter - 1):
                o = fn()
            np.asarray(o[:1])
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return B / best

    for kb in (3, 7, 15):
        r = rate(lambda: dk.damerau_seqband_long_1v_many(
            None, bc, lt, lbmax=lbmax, kband=kb, staged=stq))
        print(json.dumps({"kernel": f"band_long_k{kb}",
                          "pairs_per_s": round(r, 1)}), flush=True)

    # the full long kernel on the same corpus (row-tile staging)
    btd, ltd2, nb, sub = dk.prepare_corpus_long(chars, lens)
    btd = jax.block_until_ready(jax.device_put(btd))
    ltd2 = jax.device_put(ltd2)
    qpad = np.pad(base, (0, (-LB) % 32), constant_values=-3)
    r_full = rate(lambda: dk.damerau_long_1v_many(
        qpad[:LB], btd, ltd2, nb=nb, sub=sub), n_iter=1)
    print(json.dumps({"kernel": "full_long", "pairs_per_s":
                      round(r_full, 1)}), flush=True)


if __name__ == "__main__":
    main()
