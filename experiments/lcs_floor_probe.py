"""Probe what floors the LCS Pallas kernel below its op-count model.

The LCS recurrence is ~16 element-ops/char (word-0/last-word-specialized
carries, phase-split masking) vs Myers' ~52, yet both kernels measure
~310-330M pairs/s at len-64 — the LCS kernel is NOT op-bound.  Probes
(each in a wedge-isolated subprocess, persistent compile cache):

* ``gather``: replace the PM gather with a constant — isolates
  ``dynamic_gather`` cost from the bit ops.
* ``len``: scan length 16/32/64 at fixed B — per-trip vs per-cell cost
  (slope = per-char cost, intercept = cell fixed cost).
* ``batch``: B = 64Ki/256Ki/1Mi at len 64 — grid overhead per cell.

Usage: ``python experiments/lcs_floor_probe.py``
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def child(probe: str, arg: int):
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, REPO)
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
    from rapidfuzz_tpu.ops.pallas import lcs_kernel as ck

    LEN = arg if probe == "len" else 64
    B = arg if probe == "batch" else 1048576
    query = np.random.default_rng(42).integers(97, 123, 64, dtype=np.int32)
    corpus = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(42), (B, LEN), 97, 123, jnp.int32))()
    cand3, lb2 = lk.prepare_corpus(corpus, jnp.full((B,), LEN, jnp.int32),
                                   LB=LEN)
    jax.block_until_ready(cand3)
    la, tabs = lk.stage_query(query, "local")
    statics = dict(LB=LEN, W=2, ntab=1, unroll=16, sub=32)

    if probe == "gather":
        # same loop structure, constant PM instead of the gather
        def _kernel(tab_ref, cand_ref, lb_ref, out_ref, *, LB, W, ntab,
                    unroll, sub):
            lb = lb_ref[:, :]
            ones = jnp.full((sub, lk.LANE), 0xFFFFFFFF, jnp.uint32)

            def one_char(row, u, s):
                c = lk.unpack_byte(row, u)
                carry = None
                new_s = []
                for w in range(W):
                    pmw = (c.astype(jnp.uint32) * jnp.uint32(2654435761)
                           ^ jnp.uint32(w))     # cheap mix, no gather
                    sw = s[w]
                    um = sw & pmw
                    x1 = sw + um
                    x2 = x1 if carry is None else x1 + carry
                    if w != W - 1:
                        c1 = (x1 < sw).astype(jnp.uint32)
                        carry = c1 if carry is None else c1 | (
                            x2 < x1).astype(jnp.uint32)
                    new_s.append(x2 | (sw - um))
                return new_s

            def body(jj, state):
                s = list(state)
                row = None
                for u in range(unroll):
                    if u % 4 == 0:
                        row = cand_ref[jj * (unroll // 4) + u // 4]
                    s = one_char(row, u, s)
                return tuple(s)

            trips = (jnp.max(lb) + (unroll - 1)) // unroll
            state = lax.fori_loop(0, trips, body, (ones,) * W)
            sim = jnp.zeros((sub, lk.LANE), jnp.int32)
            for w in range(W):
                sim = sim + lax.population_count(~state[w]).astype(jnp.int32)
            out_ref[:, :] = sim

        def run():
            kern = functools.partial(_kernel, **statics)
            return pl.pallas_call(
                kern,
                grid=(cand3.shape[1] // 32,),
                in_specs=[
                    pl.BlockSpec((2, 32, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((LEN // 4, 32, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((32, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((cand3.shape[1], 128),
                                               jnp.int32),
            )(tabs, cand3, lb2)
        fn = run
    else:
        fn = lambda: ck._run(tabs, cand3, lb2, **statics)

    out = fn()
    np.asarray(out[:1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        np.asarray(out[:1, :1])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(json.dumps({"probe": probe, "arg": arg, "ms": best * 1e3,
                      "pairs_per_s": B / best}))


CONFIGS = [("gather", 0), ("len", 16), ("len", 32), ("len", 64),
           ("batch", 65536), ("batch", 262144), ("batch", 1048576)]


def main():
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=CACHE,
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    for probe, arg in CONFIGS:
        for attempt in range(2):
            try:
                p = subprocess.run(
                    [sys.executable, "-u", __file__, "--child", probe,
                     str(arg)], env=env, capture_output=True, text=True,
                    timeout=300)
                lines = [l for l in p.stdout.splitlines()
                         if l.startswith("{")]
                if lines:
                    print(lines[-1], flush=True)
                    break
                print(f"# {probe}/{arg} rc={p.returncode}: "
                      f"{p.stderr[-200:]}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"# {probe}/{arg} timeout (attempt {attempt})",
                      flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], int(sys.argv[i + 2]))
    else:
        main()
