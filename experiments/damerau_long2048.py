"""Hardware probe: long-form Damerau kernel at a 2048-char bucket.

VERDICT round-3 gate #4: a 2048-char-bucket Damerau scan >= 10x the XLA
path, oracle-exact.  Timing uses pipelined windows with fresh queries +
one-element fetch (the only valid method through the axon tunnel).

Run on the TPU:  python experiments/damerau_long2048.py
"""

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops import damerau as dam_ops
from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
from rapidfuzz_tpu.utils import codec


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def main():
    rng = np.random.default_rng(9)
    B, LB, qlen = 256, 2000, 512
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

    # exactness vs the oracle (spot sample)
    out = np.asarray(dk.damerau_long_1v_many(qs[0], btd, ltd, nb=nb,
                                             sub=sub))
    for i in range(0, B, 37):
        exp = oracle.damerau(qs[0].astype(np.int64),
                             chars[i, :lens[i]].astype(np.int64))
        assert out[i] == exp, (i, out[i], exp)
    print(json.dumps({"exact_sample": "ok", "nb": nb, "sub": sub}),
          flush=True)

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

    # XLA path: the batched damerau op over the padded corpus
    cb, lbv = codec.pad_batch([c[:n] for c, n in
                               zip(chars.astype(np.int64), lens)])
    cbd = jax.device_put(jnp.asarray(cb))
    lbd = jnp.asarray(lbv)
    fn = jax.jit(dam_ops.damerau_distance)

    def xla_call(q):
        qc, ql = codec.pad_batch([q.astype(np.int64)])
        return fn(jnp.asarray(qc), jnp.asarray(ql), cbd, lbd)

    t_xla = window(xla_call, iters=2)
    print(json.dumps({
        "B": B, "LB": LB, "qlen": qlen,
        "pallas_ms": round(t_dev * 1e3, 2),
        "xla_ms": round(t_xla * 1e3, 2),
        "speedup": round(t_xla / t_dev, 1),
        "pallas_pairs_per_s": round(B / t_dev),
    }), flush=True)


if __name__ == "__main__":
    main()
