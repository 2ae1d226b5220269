"""Multi-word static band kernel: TPU correctness + speed vs full kernel.

Configs chosen to hit flat bw=1/2/3 and the fori form, at query lengths
where routing predicts a win (W >= bw + 1 flat, W >= 3*bw fori).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops.pallas import band_kernel as bk
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk


def rate(fn, B):
    out = fn()
    np.asarray(out[:1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        np.asarray(out[:1, :1])
        best = min(best, (time.perf_counter() - t0) / 10)
    return B / best


def main():
    rng = np.random.default_rng(1)
    B = 1 << 23
    for qlen, LB, cutoff in [(64, 64, 15), (64, 64, 31), (128, 128, 31),
                             (128, 128, 47), (256, 256, 47)]:
        bw = bk.band_words(cutoff)
        flat = LB * bw <= bk.FLAT_MAX_STEPS
        q = rng.integers(97, 123, qlen).astype(np.int32)
        chars = rng.integers(97, 123, (B, LB)).astype(np.int32)
        lens = np.full(B, LB, np.int32)
        # plant near-copies (pad with query, then corrupt) in first rows
        for i in range(512):
            chars[i, :qlen] = q
            chars[i, qlen:] = -1
            lens[i] = qlen
            for _ in range(int(rng.integers(0, cutoff + 4))):
                chars[i, rng.integers(0, qlen)] = rng.integers(97, 123)
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars),
                                       jnp.asarray(lens), LB=LB)
        cand3 = jax.block_until_ready(cand3)
        t0 = time.time()
        out = np.asarray(bk.lev_banded_1v_many(
            q, cand3, lb2, cutoff=cutoff, mode="byte")).reshape(-1)
        comp = time.time() - t0
        bad = 0
        for i in range(0, 512, 7):
            exp = oracle.levenshtein_uniform(
                q.astype(np.int64), chars[i, :lens[i]].astype(np.int64))
            got = out[i]
            if exp <= cutoff:
                bad += got != exp
            else:
                bad += got <= cutoff
        stg = bk.stage_banded(q, "byte", LB, cutoff)
        r_band = rate(lambda: bk.lev_banded_1v_many(
            q, cand3, lb2, cutoff=cutoff, mode="byte", staged=stg), B)
        mode = lk.pick_mode(q, 122)
        st = lk.stage_query(q, mode)
        r_full = rate(lambda: lk.lev_1v_many(q, cand3, lb2, mode=mode,
                                             staged=st), B)
        print(f"qlen={qlen} LB={LB} cut={cutoff} bw={bw} "
              f"{'flat' if flat else 'fori'} compile={comp:.0f}s bad={bad} "
              f"band={r_band/1e9:.2f}G full={r_full/1e9:.2f}G "
              f"({r_band/r_full:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
