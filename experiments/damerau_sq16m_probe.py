"""Hardware validation: the package's int16 sequential-pair Damerau routes.

Runs the SHIPPED kernels from ``rapidfuzz_tpu.ops.pallas.damerau_kernel``
on the real chip (no local re-implementations):

  1. compile + exactness of ``_run_sq16m`` (compare-free mask-algebra
     body) and ``_run_sq16`` (cmpi body) against the hardware-validated
     int32 ``_run_sq`` on a ragged-length, transposition-rich corpus,
     plus a 64-pair spot check against the C scalar oracle route;
  2. throughput at the bench shape (B = 2^18, len 64) for i32 sub 16/32
     and each i16 body that compiles, sub 16/32.

Decision rule (ROADMAP lead 1): if a body is bit-exact and >= 1.3x the
int32 rate, flip ``damerau_seq_1v_many``'s default to it (and rerun
``tools/hw_smoke.py`` before shipping).

Run on the TPU:  python -u experiments/damerau_sq16m_probe.py
"""

import functools
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

LANE = 128


def sync(out):
    np.asarray(out.ravel()[:1])


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(11)
    LB = 64
    sub = 16

    # ---------------- correctness: ragged lens, 6-char alphabet ----------
    B = sub * LANE * 2
    lens = rng.integers(0, LB + 1, B)
    lens[:4] = [0, 1, LB, LB]
    chars = np.full((B, LB), -1, np.int64)
    for c in range(B):
        chars[c, :lens[c]] = rng.integers(97, 103, lens[c])
    q = rng.integers(97, 103, LB).astype(np.int32)
    qpad, la = dk._encode_query_rows(q)
    la_d = jnp.array([la], jnp.int32)

    b32, lb32, lbmax = dk.prepare_corpus_seq(
        chars.astype(np.int32), lens, sub=sub, dtype=np.int32)
    want = np.asarray(dk._run_sq(jnp.asarray(qpad), la_d, jnp.asarray(b32),
                                 jnp.asarray(lb32), sub=sub, lbmax=lbmax)
                      ).reshape(-1)

    # scalar-oracle spot check of the i32 reference itself
    from rapidfuzz_tpu.distance import damerau_levenshtein as dl
    idx = rng.choice(B, 64, replace=False)
    qs = "".join(chr(c) for c in q)
    orc = np.array([dl.distance(qs, "".join(chr(v) for v in
                                            chars[c, :lens[c]]))
                    for c in idx])
    print(json.dumps({"check": "i32_vs_scalar_oracle",
                      "ok": bool((orc == want[idx]).all())}), flush=True)

    b16, lb16, _ = dk.prepare_corpus_seq(
        chars.astype(np.int32), lens, sub=sub, dtype=np.int16)
    assert b16.dtype == np.int16
    q16 = np.where(np.abs(qpad) > dk.I16_CHAR_MAX, -3, qpad)
    bodies = {"sq16m": dk._run_sq16m, "sq16": dk._run_sq16}
    alive = {}
    for name, body in bodies.items():
        try:
            got = np.asarray(body(jnp.asarray(q16), la_d, jnp.asarray(b16),
                                  jnp.asarray(lb16), sub=sub, lbmax=lbmax)
                             ).reshape(-1)
        except Exception as e:  # noqa: BLE001 — Mosaic may reject i16
            print(json.dumps({"check": name,
                              "error": str(e).replace("\n", " ")[:200]}),
                  flush=True)
            continue
        ok = bool((got.astype(np.int64) == want).all())
        print(json.dumps({"check": f"{name}_vs_i32", "ok": ok,
                          "mismatches": int((got != want).sum())}),
              flush=True)
        if ok:
            alive[name] = body

    # ---------------- throughput at the bench shape ----------------------
    Bb = 1 << 18
    lensb = np.full(Bb, LB)
    charsb = rng.integers(97, 123, (Bb, LB)).astype(np.int32)
    queries = [np.asarray(rng.integers(97, 123, LB), np.int32)
               for _ in range(97)]
    rates = {}
    for name, body, dt in ([("sq_i32", dk._run_sq, np.int32)]
                           + [(n, b, np.int16) for n, b in alive.items()]):
        for sub_t in (16, 32):
            bc, lbt, lbm = dk.prepare_corpus_seq(charsb, lensb, sub=sub_t,
                                                 dtype=dt)
            b_d = jax.device_put(jnp.asarray(bc))
            lb_d = jax.device_put(jnp.asarray(lbt))
            qit = itertools.cycle(queries)

            def call():
                qp, la_ = dk._encode_query_rows(next(qit))
                if dt == np.int16:
                    qp = np.where(np.abs(qp) > dk.I16_CHAR_MAX, -3, qp)
                return body(jnp.asarray(qp), jnp.array([la_], jnp.int32),
                            b_d, lb_d, sub=sub_t, lbmax=lbm)

            try:
                sync(call())
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"mode": f"{name}_sub{sub_t}",
                                  "error": str(e)[:160]}), flush=True)
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = call()
                sync(out)
                best = min(best, (time.perf_counter() - t0) / 8)
            rates[f"{name}_sub{sub_t}"] = Bb / best
            print(json.dumps({"mode": f"{name}_sub{sub_t}",
                              "ms": round(best * 1e3, 3),
                              "pairs_per_s": round(Bb / best)}), flush=True)

    base = max((v for k, v in rates.items() if k.startswith("sq_i32")),
               default=0.0)
    for k, v in rates.items():
        if not k.startswith("sq_i32") and base:
            print(json.dumps({"speedup": k, "vs_i32": round(v / base, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
