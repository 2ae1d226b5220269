"""Hardware probe: long Damerau kernel extended to 8192-char candidates.

Round-4 extension: MAX_TEXT_LONG 4096 -> 8192.  nb=64 column blocks run
at sub=32 (past 48 blocks Mosaic's unroll-scaled stack temporaries
force sub * nb <= 2048 half-height tiles — nb=64 at sub=64 wants 20.95M
scoped VMEM vs the 16M limit, evidence/damerau_long_8k_oom_r4.log);
the packed last-match scan moves to 14-bit columns
(PBIG = 65536, still < 2^31 after the shift).  Gate: oracle-exact on a
sample, and the 8192 bucket beats the XLA path it previously fell to.
Timing uses pipelined windows with fresh queries + one-element fetch
(the only valid method through the axon tunnel).

Run on the TPU:  python experiments/damerau_long_8k.py
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
    # transposition straddling a block seam beyond the old 4096 cap
    if LB > 6144 and lens[1] > 6145:
        chars[1, 6143], chars[1, 6144] = chars[1, 6144], chars[1, 6143]
    bt, lt, nb, sub = dk.prepare_corpus_long(chars, lens)
    btd = jax.device_put(jnp.asarray(bt))
    ltd = jax.device_put(jnp.asarray(lt))
    sync(btd)

    t0 = time.perf_counter()
    out = np.asarray(dk.damerau_long_1v_many(qs[0], btd, ltd, nb=nb,
                                             sub=sub))
    t_compile = time.perf_counter() - t0
    for i in list(range(0, B, 17)) + [1]:
        exp = oracle.damerau(qs[0].astype(np.int64),
                             chars[i, :lens[i]].astype(np.int64))
        assert out[i] == exp, (LB, i, out[i], exp)
    print(json.dumps({"LB": LB, "exact_sample": "ok", "nb": nb,
                      "sub": sub, "compile_s": round(t_compile, 1)}),
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


def scanner_check(LB=5000, B=32, qlen=300):
    """End-to-end: CorpusScanner routes a >4096-char str corpus through
    the long kernel (previously the XLA scan) and stays oracle-exact."""
    from rapidfuzz_tpu.parallel.scan import CorpusScanner

    rng = np.random.default_rng(21)
    corpus = ["".join(chr(97 + int(c))
                      for c in rng.integers(0, 26,
                                            int(rng.integers(4097, LB))))
              for _ in range(B)]
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, qlen))
    enc = lambda s: np.array([ord(c) for c in s], np.int64)
    sc = CorpusScanner(corpus, metric="damerau_levenshtein")
    assert sc._dam_long, "scanner did not route the long kernel"
    got = np.asarray(sc.distances(q))
    for i in range(0, B, 5):
        exp = oracle.damerau(enc(q), enc(corpus[i]))
        assert got[i] == exp, (i, got[i], exp)
    print(json.dumps({"scanner_5000": "ok", "B": B}), flush=True)


def main():
    run_bucket(6016, 128, 512)
    run_bucket(8192, 128, 512)
    scanner_check()


if __name__ == "__main__":
    main()
