"""Sweep the SHIPPED lev kernel's static config space on real hardware.

Drives ``lev_kernel._run`` directly (no copied kernel body, so this tool
cannot drift from the library) over (sub, unroll, mode) at the headline
shape, verifying a sample against the oracle per config.  The shipped
defaults (sub=32, unroll=16) won the original sweep; re-run after kernel
changes.  Use a large B (env SWEEP_B, default 8M) — at 1M the fixed
~2.3 ms dispatch cost of the axon tunnel hides compute differences.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from rapidfuzz_tpu import oracle
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk

    rng = np.random.default_rng(42)
    LEN = 64
    B = int(os.environ.get("SWEEP_B", 1 << 23))
    W = 2
    q = rng.integers(97, 123, LEN, dtype=np.int32)

    # host sample for oracle checks; corpus generated on device in chunks
    sample = rng.integers(97, 123, (8, LEN), dtype=np.int32)
    exp = [oracle.levenshtein_uniform(q.astype(np.int64),
                                      row.astype(np.int64))
           for row in sample]
    step = 1 << 22
    packed = []
    for s in range(0, B, step):
        n = min(step, B - s)
        c = jax.jit(lambda k, n=n: jax.random.randint(
            k, (n, LEN), 97, 123, jnp.int32))(jax.random.PRNGKey(s))
        if s == 0:
            c = c.at[:8].set(jnp.asarray(sample))
        c3, _ = lk.prepare_corpus(c, jnp.full((n,), LEN, jnp.int32), LB=LEN)
        packed.append(jax.block_until_ready(c3))
        del c
    cand3 = packed[0] if len(packed) == 1 else jnp.concatenate(packed,
                                                               axis=1)
    lb2 = jnp.full((B // 128, 128), LEN, jnp.int32)
    jax.block_until_ready(cand3)

    for mode in ("local", "byte"):
        ntab = 2 if mode == "byte" else 1
        for sub in (8, 16, 32, 64):
            la, tabs = lk.stage_query(q, mode, sub)
            for unroll in (4, 8, 16, 32):
                if LEN % unroll:
                    continue
                try:
                    fn = lambda: lk._run(la, tabs, cand3, lb2, LB=LEN, W=W,
                                         ntab=ntab, unroll=unroll, sub=sub)
                    out = fn()
                    flat = np.asarray(out[0, :8])
                    ok = all(int(flat[i]) == e for i, e in enumerate(exp))
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(10):
                            out = fn()
                        np.asarray(out[:1, :1])
                        best = min(best, (time.perf_counter() - t0) / 10)
                    print(json.dumps({
                        "mode": mode, "sub": sub, "unroll": unroll,
                        "ok": ok, "ms": round(best * 1e3, 3),
                        "Mpairs_s": round(B / best / 1e6, 1)}), flush=True)
                except Exception as e:
                    print(json.dumps({"mode": mode, "sub": sub,
                                      "unroll": unroll,
                                      "err": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
