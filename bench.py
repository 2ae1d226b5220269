"""Headline benchmark: Levenshtein pair comparisons/s/chip (len-64 ASCII).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json target of 1e9 pairs/s/chip
(the reference publishes no absolute numbers — SURVEY.md §6).

Runs on whatever jax.devices()[0] is (the axon TPU in the driver's
environment). Also reports the one-vs-many scan bandwidth in bytes/s as a
secondary field.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from rapidfuzz_tpu.ops.levenshtein import uniform_distance
    from rapidfuzz_tpu.utils import codec

    rng = np.random.default_rng(42)
    LEN = 64
    B = int(__import__("os").environ.get("BENCH_B", 16384))

    query = rng.integers(97, 123, LEN, dtype=np.int32)
    corpus = rng.integers(97, 123, (B, LEN), dtype=np.int32)
    qc, ql = codec.pad_batch([query], bucket=LEN)
    cc = corpus
    cl = np.full(B, LEN, np.int32)

    dev = jax.devices()[0]
    qc, ql, cc, cl = (jax.device_put(x, dev) for x in (qc, ql, cc, cl))

    fn = jax.jit(uniform_distance)
    out = fn(qc, ql, cc, cl)
    out.block_until_ready()  # compile + warm

    # correctness spot check against the host oracle
    from rapidfuzz_tpu import oracle
    got = np.asarray(out)
    for i in range(4):
        exp = oracle.levenshtein_uniform(query.astype(np.int64),
                                         corpus[i].astype(np.int64))
        assert got[i] == exp, (i, got[i], exp)

    # steady-state timing
    iters = 5
    fn(qc, ql, cc, cl).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(qc, ql, cc, cl)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pairs_per_s = B * iters / dt
    bytes_per_s = pairs_per_s * LEN
    target = 1e9
    print(json.dumps({
        "metric": "levenshtein_pairs_per_sec_per_chip_len64",
        "value": pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": pairs_per_s / target,
        "extra": {
            "bytes_per_s_one_vs_many": bytes_per_s,
            "batch": B,
            "iters": iters,
            "seconds": dt,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
