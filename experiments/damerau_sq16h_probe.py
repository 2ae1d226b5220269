"""Hybrid int16 sequential-pair Damerau: only v5e-supported i16 ops.

The capability matrix (evidence/i16_ops_probe_16x128_r4.log) says v5e
Mosaic lowers i16 add / bitwise / cmpi-eq-ne / i32-mask-driven i16
selects — but NOT sub / neg / shifts / mul / ordered compares / min /
max.  Both earlier i16 bodies needed the missing ops.  This body avoids
them entirely:

* subtractions eliminated by carrying NEGATED state: ``negk = -k`` and
  ``neg_reg_l = -reg_l`` are only ever assigned broadcast scalars /
  compile-time constants (scalar negation happens in the scalar domain),
  so ``i - k`` becomes the vector ADD ``i + negk``;
* ``min(a, b)`` via an i32-widened compare driving an i16 select
  (the probe's one passing ordered-compare form);
* equality masks via native i16 ``cmpi eq``.

Per cell: ~27 i16 vector ops vs the i32 body's ~22 — if i16 runs two
elements per lane and the widened compares don't relayout-thrash, the
model predicts up to ~1.6x.  Validates compile + exactness against the
shipped int32 `_run_sq`, then rates both at B = 2^20.

HARDWARE VERDICT (r4, evidence/damerau_sq16h_probe_r4.log): dies on
``arith.cmpi eq vector<8x128x2xi16>`` — v5e has NO i16 vector compares
at all.  The ops probe's earlier compare "OK"s were canonicalization
artifacts (``where(x==y, x, y)`` folds to ``y``); the fold-proof rerun
(evidence/i16_ops_probe_16x128_r4.log) shows only add/and/or/xor/not
lower.  A DP needs min + eq, so no i16 body is expressible on this
hardware.  Interpret-mode semantics stay verified; do not re-run on
v5e.

Run on the TPU:  python -u experiments/damerau_sq16h_probe.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

LANE = 128
I16 = jnp.int16
BIG16 = np.int16(1 << 12)


def _kernel_sq16h(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
                  nk_ref, *, sub: int, lbmax: int):
    la = la_ref[0]
    lb = lb_ref[0]
    zeros = jnp.zeros((sub, LANE), I16)
    bigs = jnp.full((sub, LANE), BIG16, I16)
    one = I16(1)

    def min_(a, b):                    # i32-widened compare, i16 select
        return jnp.where(a.astype(jnp.int32) < b.astype(jnp.int32), a, b)

    for j in range(lbmax):
        dp_ref[0, j] = zeros + I16(j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        nk_ref[j] = zeros              # negk = -k, k starts 0

    def row(i, carry):
        par = i & 1
        ai = q_ref[i - 1].astype(I16)
        i16s = i.astype(I16)           # scalar
        negi = (0 - i).astype(I16)     # scalar-domain negation
        ii = zeros + i16s
        d_left = ii
        d_diag = ii + I16(-1)
        d_diag_prev = bigs
        d2_left = jnp.where(i >= 2, ii + I16(-2), bigs)
        neg_reg_l = zeros              # -reg_l, reg_l starts 0
        reg_t = bigs
        for j in range(lbmax):
            jcol = I16(j + 1)
            c2 = b_ref[j]
            eq = c2 == ai
            d_up = dp_ref[1 - par, j]
            d2 = dp_ref[par, j]
            fr = fr_ref[j]
            negk = nk_ref[j]
            cost = jnp.where(eq, zeros, zeros + one)
            cand = min_(d_diag + cost, min_(d_up, d_left) + one)
            djL = neg_reg_l + jcol     # jcol - reg_l, as an ADD
            iK = negk + i16s           # i - k, as an ADD
            m1 = djL == one
            tr = jnp.where(m1, fr + iK, reg_t + djL)
            tr = jnp.where(m1 | (iK == one), tr, bigs)
            new = min_(cand, jnp.where(eq, bigs, tr))
            fr_ref[j] = jnp.where(eq, d_diag_prev, fr)
            nk_ref[j] = jnp.where(eq, zeros + negi, negk)
            reg_t = jnp.where(eq, d2_left, reg_t)
            neg_reg_l = jnp.where(eq, zeros + I16(-(j + 1)), neg_reg_l)
            dp_ref[par, j] = new
            d_left = new
            d_diag_prev = d_diag
            d_diag = d_up
            d2_left = d2
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    res = zeros + la.astype(I16)
    parf = la & 1
    for j in range(lbmax):
        res = jnp.where(lb == I16(j + 1), dp_ref[parf, j], res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "interpret"))
def _run_sq16h(q, la, b_cols16, lb16, *, sub=16, lbmax=64,
               interpret=False):
    nblocks = b_cols16.shape[0] // lbmax
    kern = functools.partial(_kernel_sq16h, sub=sub, lbmax=lbmax)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lbmax, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int16),
        scratch_shapes=[pltpu.VMEM((2, lbmax, sub, LANE), jnp.int16),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int16),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int16)],
        interpret=interpret,
    )(q, la, b_cols16, lb16)


def sync(o):
    np.asarray(o.ravel()[:1])


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(17)
    LB, sub = 64, 16

    # correctness: ragged lens, small alphabet (transposition-rich)
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
    b16, lb16, _ = dk.prepare_corpus_seq(
        chars.astype(np.int32), lens, sub=sub, dtype=np.int16)
    q16 = np.where(np.abs(qpad) > dk.I16_CHAR_MAX, -3, qpad)
    try:
        got = np.asarray(_run_sq16h(jnp.asarray(q16), la_d,
                                    jnp.asarray(b16), jnp.asarray(lb16),
                                    sub=sub, lbmax=lbmax)).reshape(-1)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"check": "sq16h",
                          "error": str(e).replace("\n", " ")[:220]}),
              flush=True)
        return
    ok = bool((got.astype(np.int64) == want).all())
    print(json.dumps({"check": "sq16h_vs_i32", "ok": ok,
                      "mismatches": int((got != want).sum())}), flush=True)
    if not ok:
        bad = np.nonzero(got.astype(np.int64) != want)[0][:5]
        for c in bad:
            print(dict(c=int(c), got=int(got[c]), want=int(want[c]),
                       len=int(lens[c])))
        return

    # throughput, B = 2^20, dispatch-amortized
    Bb = 1 << 20
    lensb = np.full(Bb, LB)
    charsb = rng.integers(97, 123, (Bb, LB)).astype(np.int32)
    queries = [np.asarray(rng.integers(97, 123, LB), np.int32)
               for _ in range(97)]
    rates = {}
    for name, body, dt in (("sq_i32", dk._run_sq, np.int32),
                           ("sq16h", _run_sq16h, np.int16)):
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
                for _ in range(6):
                    out = call()
                sync(out)
                best = min(best, (time.perf_counter() - t0) / 6)
            rates[f"{name}_sub{sub_t}"] = Bb / best
            print(json.dumps({"mode": f"{name}_sub{sub_t}",
                              "ms": round(best * 1e3, 2),
                              "pairs_per_s": round(Bb / best)}), flush=True)
    base = max((v for k, v in rates.items() if k.startswith("sq_i32")),
               default=0)
    for k, v in rates.items():
        if k.startswith("sq16h") and base:
            print(json.dumps({"speedup": k, "vs_i32": round(v / base, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
