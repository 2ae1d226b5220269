"""Hardware probe: reduction-free long Damerau kernel at 2048/4096 chars.

Round-4 rewrite check (VERDICT #7): the cross-block carries are now
injected through lane-0 rolls instead of five masked lane reductions per
block, and MAX_TEXT_LONG rose to 4096.  Gate: oracle-exact, and a
4096-char bucket >= 3x the XLA path.  Timing uses pipelined windows with
fresh queries + one-element fetch (the only valid method through the
axon tunnel).

Run on the TPU:  python experiments/damerau_long_r4.py
"""

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops import damerau as dam_ops
from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
from rapidfuzz_tpu.utils import codec


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def run_bucket(LB, B, qlen, xla=True):
    rng = np.random.default_rng(9)
    chars = np.full((B, LB), -1, np.int32)
    lens = np.zeros(B, np.int32)
    qs = [rng.integers(97, 123, qlen).astype(np.int32) for _ in range(33)]
    for i in range(B):
        n = int(rng.integers(LB // 2, LB + 1))
        arr = rng.integers(97, 123, n).astype(np.int32)
        if i % 4 == 0:
            arr[:qlen] = qs[0]
        chars[i, :n] = arr
        lens[i] = n
    bt, lt, nb, sub = dk.prepare_corpus_long(chars, lens)
    btd = jax.device_put(jnp.asarray(bt))
    ltd = jax.device_put(jnp.asarray(lt))
    sync(btd)

    out = np.asarray(dk.damerau_long_1v_many(qs[0], btd, ltd, nb=nb,
                                             sub=sub))
    for i in range(0, B, 37):
        exp = oracle.damerau(qs[0].astype(np.int64),
                             chars[i, :lens[i]].astype(np.int64))
        assert out[i] == exp, (LB, i, out[i], exp)
    print(json.dumps({"LB": LB, "exact_sample": "ok", "nb": nb,
                      "sub": sub}), flush=True)

    it = itertools.cycle(qs)

    def window(fn, iters=4):
        sync(fn(next(it)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(next(it))
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_dev = window(lambda q: dk.damerau_long_1v_many(
        q, btd, ltd, nb=nb, sub=sub))
    rec = {"B": B, "LB": LB, "qlen": qlen,
           "pallas_ms": round(t_dev * 1e3, 2),
           "pallas_pairs_per_s": round(B / t_dev)}
    if xla:
        cb, lbv = codec.pad_batch([c[:n] for c, n in
                                   zip(chars.astype(np.int64), lens)])
        cbd = jax.device_put(jnp.asarray(cb))
        lbd = jnp.asarray(lbv)
        fn = jax.jit(dam_ops.damerau_distance)

        def xla_call(q):
            qc, ql = codec.pad_batch([q.astype(np.int64)])
            return fn(jnp.asarray(qc), jnp.asarray(ql), cbd, lbd)

        t_xla = window(xla_call, iters=2)
        rec.update(xla_ms=round(t_xla * 1e3, 2),
                   speedup=round(t_xla / t_dev, 1))
    print(json.dumps(rec), flush=True)


def main():
    run_bucket(2000, 256, 512)
    run_bucket(4096, 128, 512)


if __name__ == "__main__":
    main()
