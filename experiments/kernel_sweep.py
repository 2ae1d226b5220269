"""Sweep the LIBRARY's Pallas kernels over tile shapes on the real TPU.

Unlike :mod:`pallas_sweep` (which benches historical standalone kernel
variants), this drives the shipped ``_run`` entry points from
``rapidfuzz_tpu.ops.pallas`` so results can't drift from the library.

Each (metric, sub, unroll) config runs in its OWN subprocess with a
timeout + one retry: the axon tunnel intermittently wedges on
device->host transfers and first compiles can take minutes — a stuck
config must not take the whole sweep down.  All children share the
repo's persistent compilation cache.

Usage::

    python experiments/kernel_sweep.py --metrics lev,lcs --subs 32,64 \
        --unrolls 16,32
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def child(metric: str, sub: int, unroll: int):
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, REPO)
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk

    B, LEN = 1048576, 64
    query = np.random.default_rng(42).integers(97, 123, LEN, dtype=np.int32)
    corpus = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(42), (B, LEN), 97, 123, jnp.int32))()
    cand3, lb2 = lk.prepare_corpus(corpus, jnp.full((B,), LEN, jnp.int32),
                                   LB=LEN)
    jax.block_until_ready(cand3)
    la, tabs = lk.stage_query(query, "local")
    statics = dict(LB=LEN, W=2, ntab=1, unroll=unroll, sub=sub)

    if metric == "lev":
        fn = lambda: lk._run(la, tabs, cand3, lb2, **statics)
    elif metric == "lcs":
        from rapidfuzz_tpu.ops.pallas import lcs_kernel as ck
        fn = lambda: ck._run(tabs, cand3, lb2, **statics)
    elif metric == "osa":
        from rapidfuzz_tpu.ops.pallas import osa_kernel as ok
        fn = lambda: ok._run(la, tabs, cand3, lb2, **statics)
    else:
        raise SystemExit(f"unknown metric {metric}")

    out = fn()
    np.asarray(out[:1, :1])         # real barrier (block_until_ready lies
    best = float("inf")             # through the tunnel)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        np.asarray(out[:1, :1])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(json.dumps({"metric": metric, "sub": sub, "unroll": unroll,
                      "pairs_per_s": B / best, "ms": best * 1e3}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="lev,lcs")
    ap.add_argument("--subs", default="32,64")
    ap.add_argument("--unrolls", default="16,32")
    ap.add_argument("--timeout", type=float, default=420.0)
    args = ap.parse_args()

    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=CACHE,
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    os.makedirs(CACHE, exist_ok=True)
    for metric in args.metrics.split(","):
        for sub in map(int, args.subs.split(",")):
            for unroll in map(int, args.unrolls.split(",")):
                for attempt in range(2):
                    try:
                        p = subprocess.run(
                            [sys.executable, "-u", __file__, "--child",
                             metric, str(sub), str(unroll)],
                            env=env, capture_output=True, text=True,
                            timeout=args.timeout)
                        line = [l for l in p.stdout.splitlines()
                                if l.startswith("{")]
                        if line:
                            print(line[-1], flush=True)
                            break
                        print(f"# {metric} sub={sub} unroll={unroll} "
                              f"rc={p.returncode}: {p.stderr[-200:]}",
                              flush=True)
                    except subprocess.TimeoutExpired:
                        print(f"# {metric} sub={sub} unroll={unroll} "
                              f"timeout (attempt {attempt})", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]))
    else:
        main()
