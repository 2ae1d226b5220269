"""Benchmark the Pallas one-vs-many Levenshtein kernel on TPU."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
from rapidfuzz_tpu import oracle


def main():
    rng = np.random.default_rng(42)
    LEN = 64
    for B in (16384, 131072, 1048576):
        q = rng.integers(97, 123, LEN, dtype=np.int32)
        corpus = rng.integers(97, 123, (B, LEN), dtype=np.int32)
        lens = np.full(B, LEN, np.int32)
        cand3, lb2 = lk.prepare_corpus(jnp.asarray(corpus),
                                       jnp.asarray(lens), LB=LEN)
        jax.block_until_ready(cand3)

        out = lk.lev_1v_many(q, cand3, lb2, mode="byte")
        jax.block_until_ready(out)
        flat = np.asarray(out).reshape(-1)
        for i in range(0, B, max(B // 7, 1)):
            exp = oracle.levenshtein_uniform(q.astype(np.int64),
                                             corpus[i].astype(np.int64))
            assert flat[i] == exp, (i, flat[i], exp)

        iters = 20 if B <= 131072 else 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = lk.lev_1v_many(q, cand3, lb2, mode="byte")
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"B": B, "ms": dt * 1e3,
                          "pairs_per_s": B / dt}), flush=True)


if __name__ == "__main__":
    main()
