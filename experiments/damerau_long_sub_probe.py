"""Hardware probe: long-Damerau 4096-char bucket `sub` sweep.

The r4 measurement (evidence/damerau_long_r4.log) shows per-pair Pallas
cost scaling 2.97x from 2000 -> 4096 chars (cells only 2.05x): the
nb=32 config halves `sub` to 64 under the `sub * nb <= 2048` scratch
guard.  This sweeps sub in {32, 64, 128} at nb=32 (128 needs ~8 MB of
row-structure scratch — may or may not fit v5e VMEM next to the 2 MB
candidate tile) and re-checks exactness per config.

Run on the TPU:  python -u experiments/damerau_long_sub_probe.py
"""

import itertools
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


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(9)
    LB, qlen = 4096, 512
    B = 128
    chars = np.full((B, LB), -1, np.int32)
    lens = rng.integers(LB // 2, LB + 1, B).astype(np.int32)
    lens[:2] = [LB, LB]
    for c in range(B):
        chars[c, :lens[c]] = rng.integers(97, 123, lens[c])
    queries = [np.asarray(rng.integers(97, 123, qlen), np.int32)
               for _ in range(17)]
    exp = oracle.damerau(queries[0].astype(np.int64),
                         chars[1, :lens[1]].astype(np.int64))

    for sub in (32, 64, 128):
        b, lbt, nb, _ = dk.prepare_corpus_long(chars, lens, sub=sub)
        b_d = jax.device_put(jnp.asarray(b))
        lb_d = jax.device_put(jnp.asarray(lbt))
        qit = itertools.cycle(queries)

        def call(q=None):
            return dk.damerau_long_1v_many(
                q if q is not None else next(qit), b_d, lb_d,
                nb=nb, sub=sub)

        try:
            got = np.asarray(call(queries[0]))
        except Exception as e:  # noqa: BLE001 — VMEM overflow expected @128
            print(json.dumps({"sub": sub,
                              "error": str(e).replace("\n", " ")[:180]}),
                  flush=True)
            continue
        ok = int(got[1]) == exp
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = call()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        print(json.dumps({"sub": sub, "nb": nb, "exact": ok,
                          "ms": round(best * 1e3, 2),
                          "pairs_per_s": round(B / best),
                          "us_per_pair": round(best / B * 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
