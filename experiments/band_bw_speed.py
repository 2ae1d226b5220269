"""Multi-word band kernel speed vs full kernel, dispatch-amortized.

Device-generated corpora (8M candidates) so the fixed ~2.3 ms tunnel
dispatch cost is <10% of a measurement; correctness is covered
separately (``band_bw_probe.py`` at 1M with planted near-copies).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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


def dev_corpus(LB, B, seed):
    step = max(1 << 18, (1 << 28) // (LB * 4))
    packed = []
    for s in range(0, B, step):
        n = min(step, B - s)
        c = jax.jit(lambda k, n=n: jax.random.randint(
            k, (n, LB), 97, 123, jnp.int32))(jax.random.PRNGKey(seed + s))
        c3, _ = lk.prepare_corpus(c, jnp.full((n,), LB, jnp.int32), LB=LB)
        packed.append(jax.block_until_ready(c3))
        del c
    cand3 = packed[0] if len(packed) == 1 else jnp.concatenate(packed,
                                                               axis=1)
    lb2 = jnp.full((B // 128, 128), LB, jnp.int32)
    return jax.block_until_ready(cand3), lb2


def main():
    rng = np.random.default_rng(1)
    B = 1 << 23
    import json
    cfgs = json.loads(os.environ.get(
        "BAND_CFGS", "[[64,64,15],[64,64,31],[128,128,31],"
        "[128,128,47],[256,256,47],[512,512,15],[512,512,47]]"))
    for qlen, LB, cutoff in cfgs:
        bw = bk.band_words(cutoff)
        flat = LB * bw <= bk.FLAT_MAX_STEPS
        q = rng.integers(97, 123, qlen).astype(np.int32)
        cand3, lb2 = dev_corpus(LB, B, seed=qlen * 7 + cutoff)
        stg = bk.stage_banded(q, "byte", LB, cutoff)
        t0 = time.time()
        r_band = rate(lambda: bk.lev_banded_1v_many(
            q, cand3, lb2, cutoff=cutoff, mode="byte", staged=stg), B)
        comp = time.time() - t0
        mode = lk.pick_mode(q, 122)
        st = lk.stage_query(q, mode)
        r_full = rate(lambda: lk.lev_1v_many(q, cand3, lb2, mode=mode,
                                             staged=st), B)
        print(f"qlen={qlen} LB={LB} cut={cutoff} bw={bw} "
              f"{'flat' if flat else 'fori'} t={comp:.0f}s "
              f"band={r_band/1e9:.2f}G full={r_full/1e9:.2f}G "
              f"({r_band/r_full:.2f}x)", flush=True)
        del cand3


if __name__ == "__main__":
    main()
