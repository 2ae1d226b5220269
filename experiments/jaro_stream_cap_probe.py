"""Hardware probe: how far past 8192 does the Jaro stream kernel compile?

JARO_STREAM_MAX_LB=16384 pencils out at ~12.6 MB VMEM but the v5e
remote compiler rejected it with an opaque tpu_compile_helper crash
(evidence/hw_conformance_r5_jaro16k_stdout.log).  This probe tries the
stream kernel at increasing LB and reports compile-fit + an
oracle-exact spot-check + rate, plus the XLA jaro path rate at the
same LB (the current fallback) for the routing decision.

Run on the TPU:  python experiments/jaro_stream_cap_probe.py
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
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
from rapidfuzz_tpu.ops.pallas import stream_kernel as sk

B = 4096
QLEN = 128


def main():
    rng = np.random.default_rng(5)
    q = rng.integers(97, 123, QLEN, dtype=np.int32)
    sk.JARO_STREAM_MAX_LB = 16384          # probe past the shipped cap

    for LB in (10240, 12288, 16384):
        @jax.jit
        def build(key, LB=LB):
            c = jax.random.randint(key, (B, LB), 97, 105, jnp.int32)
            return lk.prepare_corpus(c, jnp.full((B,), LB, jnp.int32),
                                     LB=LB), c

        (cand3, lb2), chars = build(jax.random.PRNGKey(3))
        cand3 = jax.block_until_ready(cand3)
        row0 = np.asarray(chars[0])
        exp = oracle.jaro(q.astype(np.int64), row0.astype(np.int64))
        t0 = time.perf_counter()
        try:
            com, tr = sk.jaro_stream_1v_many(q, cand3, lb2, mode="byte")
            com = np.asarray(com).reshape(-1)
            tr = np.asarray(tr).reshape(-1)
            t_first = time.perf_counter() - t0
            from rapidfuzz_tpu.distance.jaro import sim_from_components
            got = sim_from_components(
                com[:1], tr[:1], np.array([QLEN]), np.array([LB]))[0]
            ok = abs(float(got) - exp) < 1e-9
            t0 = time.perf_counter()
            out = sk.jaro_stream_1v_many(q, cand3, lb2, mode="byte")
            np.asarray(out[0][:1, :1])
            dt = time.perf_counter() - t0
            print(json.dumps({"LB": LB, "stream": "ok", "exact": bool(ok),
                              "t_first_s": round(t_first, 1),
                              "pairs_per_s": round(B / dt, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"LB": LB, "stream":
                              f"FAIL {type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)
            break
    print("done", flush=True)


if __name__ == "__main__":
    main()
