"""Hardware probe: streamed-block long Damerau at 8192 chars.

Round-4 left the 8192 bucket at half-height tiles (sub=32, 1.3x the XLA
scan) because Mosaic's unroll-scaled stack temporaries reject sub=64 at
nb=64 (evidence/damerau_long_8k_oom_r4.log).  The streamed-block kernel
(_kernel_long_stream: fori over blocks, dynamic scratch indexing,
carries in scratch) keeps compile-time temporaries constant in nb, so
full-height sub=64 tiles fit.  Gate: oracle-exact on a sample, and the
streamed rate vs the unrolled half-height rate at 8192.

Run on the TPU:  python experiments/damerau_long_stream.py
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

LB = 8192
B = 128
QLEN = 512


def main():
    rng = np.random.default_rng(42)
    q = rng.integers(97, 123, QLEN, dtype=np.int32)
    nb = -(-LB // 128)

    @jax.jit
    def build(key):
        b = jax.random.randint(key, (B, nb * 128), 97, 123, jnp.int32)
        b = jnp.where(jnp.arange(nb * 128) < LB, b, -2)
        lb = jnp.full((B, 128), LB, jnp.int32)
        return b, lb

    btd, ltd = build(jax.random.PRNGKey(7))
    btd = jax.block_until_ready(btd)
    row0 = np.asarray(btd[0, :LB])
    exp0 = oracle.damerau(q.astype(np.int64), row0.astype(np.int64))
    qpad = np.pad(q, (0, (-QLEN) % 32), constant_values=-3)
    la = np.array([QLEN], np.int32)

    def rate(run, sub, label):
        t0 = time.perf_counter()
        out = run(qpad, la, btd, ltd, sub=sub, nb=nb, interpret=False)
        got = int(np.asarray(out).sum(axis=1)[0])
        t_first = time.perf_counter() - t0
        assert got == exp0, (label, got, exp0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(qpad, la, btd, ltd, sub=sub, nb=nb, interpret=False)
            np.asarray(o[:1, :1])
            best = min(best, time.perf_counter() - t0)
        r = B / best
        print(json.dumps({"kernel": label, "sub": sub,
                          "pairs_per_s": round(r, 1),
                          "t_first_s": round(t_first, 1)}), flush=True)
        return r

    import functools
    r_old = rate(dk._run_long, 32, "unrolled_sub32")
    best = 0.0
    for sub, U in ((64, 32), (64, 16)):
        try:
            r = rate(functools.partial(dk._run_long_stream, unroll=U),
                     sub, f"streamed_sub{sub}_u{U}")
            best = max(best, r)
        except Exception as e:
            print(json.dumps({"kernel": f"streamed_sub{sub}_u{U}",
                              "fail": f"{type(e).__name__}: "
                                      f"{str(e)[:120]}"}), flush=True)
    print(json.dumps({"speedup_best_streamed_vs_unrolled":
                      round(best / r_old, 2)}), flush=True)


if __name__ == "__main__":
    main()
