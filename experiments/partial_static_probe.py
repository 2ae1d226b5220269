"""Hardware probe: dynamic vs quantized-static partial_ratio window body.

Bench shape (m=24 query, len-64 candidates, byte mode); measures the
window-sweep rate of

  * the round-2 dynamic flat body (M=32 pad, per-window select masks,
    4 starts/trip), and
  * the quantized-static body ``_kernel_q`` (M8=24 static, masked-PM
    identity freeze, G starts/trip) for G in {4, 8, 16}.

Timing via bench._rate (enqueue a 10-call window, one-element fetch at
the end — the only sound method through the axon tunnel; see
ROADMAP.md lead 1).  Run:  python experiments/partial_static_probe.py
Optional env: PROBE_B (default 2^22).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CACHE_DIR, _corpus, _rate, _setup_jax  # noqa: E402


def main():
    jax = _setup_jax()
    import numpy as np
    import jax.numpy as jnp
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
    from rapidfuzz_tpu.ops.pallas import partial_kernel as pk
    from rapidfuzz_tpu.ops.pallas import tpu_backend

    interpret = not tpu_backend()
    B = int(os.environ.get("PROBE_B", 1 << 22))
    LEN, B, query, _, cand3, lb2, mode = _corpus(lk, interpret, default_b=B)
    q = np.random.default_rng(9).integers(97, 123, 24, np.int32)
    la_arr = jnp.array([24], jnp.int32)
    tabs = jnp.asarray(lk.build_pm_tables(q, mode))
    LB = int(cand3.shape[0]) * 4
    ntab = 2 if mode == "byte" else 1
    M8, exact = pk.quantize_m(24)

    results = {}

    def probe(name, **kw):
        t0 = time.time()
        fn = lambda: pk._run(la_arr, tabs, cand3, lb2, LB=LB, W=1,
                             ntab=ntab, interpret=interpret, **kw)[0]
        rate, best = _rate(fn, B, interpret)
        results[name] = {"pairs_per_s": rate, "ms_per_call": best * 1e3,
                         "compile_s": round(time.time() - t0 - 30 * best,
                                            1)}
        print(json.dumps({name: results[name]}), flush=True)

    probe("dynamic_flat", flat=True)
    for G in (4, 8, 16):
        probe(f"static_G{G}", M8=M8, exact=exact, G=G)

    base = results["dynamic_flat"]["pairs_per_s"]
    for k, v in results.items():
        v["vs_dynamic"] = round(v["pairs_per_s"] / base, 3)
    print(json.dumps({"B": B, "results": results}, indent=1))


if __name__ == "__main__":
    main()
