"""Probe: pure-int16 sequential-pair Damerau kernel.

The int32 `_kernel_sq` is ALU-bound (~35M pairs/s; row-fusion that halves
VMEM traffic moves nothing — damerau_rowfuse_probe). int16 packs two
elements per VPU lane, a potential 2x. The r3 attempt failed with a
Mosaic i1-mask relayout ("16,{0,0},(8,128)" -> "16,{*,*}") caused by
mixing 32-bit-layout masks (int32 compares) into 16-bit selects; this
variant keeps EVERY vector operand int16 — corpus tiles are staged as
int16, scalars are cast before broadcast, constants are explicit int16.

Value range: BIG16 = 1<<12 must dominate every real distance, so this
kernel is only valid for la + lbmax < 4096 (the production router gates
on that; sums stay < 1<<13 << 32767 so no overflow).

Run on the TPU:  python -u experiments/damerau_seq_i16.py
"""

import functools
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BIG16 = np.int16(1 << 12)
I16 = jnp.int16


def _kernel_sq16(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
                 kk_ref, *, sub: int, lbmax: int):
    la = la_ref[0]
    lb = lb_ref[0]                         # int16 tile
    zeros = jnp.zeros((sub, LANE), I16)
    bigs = jnp.full((sub, LANE), BIG16, I16)
    one = I16(1)

    for j in range(lbmax):
        dp_ref[0, j] = zeros + I16(j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        kk_ref[j] = zeros

    def row(i, carry):
        par = i & 1
        ai = q_ref[i - 1].astype(I16)
        i16 = i.astype(I16)
        ii = zeros + i16
        d_left = ii
        d_diag = ii - one
        d_diag_prev = bigs
        d2_left = jnp.where(ii >= I16(2), ii - I16(2), bigs)
        reg_l = zeros
        reg_t = bigs
        for j in range(lbmax):
            jcol = I16(j + 1)
            c2 = b_ref[j]
            eq = c2 == ai
            d_up = dp_ref[1 - par, j]
            d2 = dp_ref[par, j]
            fr = fr_ref[j]
            k = kk_ref[j]
            cost = jnp.where(eq, I16(0), one)
            cand = jnp.minimum(d_diag + cost,
                               jnp.minimum(d_up, d_left) + one)
            djL = jcol - reg_l
            iK = i16 - k
            m1 = djL == one
            tr = jnp.where(m1, fr + iK, reg_t + djL)
            tr = jnp.where(m1 | (iK == one), tr, BIG16)
            new = jnp.minimum(cand, jnp.where(eq, BIG16, tr))
            fr_ref[j] = jnp.where(eq, d_diag_prev, fr)
            kk_ref[j] = jnp.where(eq, ii, k)
            reg_t = jnp.where(eq, d2_left, reg_t)
            reg_l = jnp.where(eq, zeros + jcol, reg_l)
            dp_ref[par, j] = new
            d_left = new
            d_diag_prev = d_diag
            d_diag = d_up
            d2_left = d2
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    res = jnp.zeros((sub, LANE), I16) + la.astype(I16)
    parf = la & 1
    for j in range(lbmax):
        res = jnp.where(lb == I16(j + 1), dp_ref[parf, j], res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "interpret"))
def run_sq16(q, la, b_cols16, lb16, *, sub, lbmax, interpret=False):
    nblocks = b_cols16.shape[0] // lbmax
    kern = functools.partial(_kernel_sq16, sub=sub, lbmax=lbmax)
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


def main():
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(17)
    LB = 64

    # --- correctness vs the production seq kernel ---
    sub = 16
    B = sub * LANE * 2
    lens = rng.integers(0, LB + 1, B)
    lens[:4] = [0, 1, LB, LB]
    chars = np.full((B, LB), -2, np.int32)
    for c in range(B):
        chars[c, :lens[c]] = rng.integers(97, 105, lens[c])
    b_cols, lb_t, lbmax = dk.prepare_corpus_seq(chars, lens, sub=sub,
                                                lbmax=LB)
    b16 = jnp.asarray(b_cols.astype(np.int16))
    lb16 = jnp.asarray(lb_t.astype(np.int16))
    for la_q in (1, 5, 64):
        q = rng.integers(97, 105, la_q).astype(np.int32)
        want = np.asarray(dk.damerau_seq_1v_many(
            q, b_cols, lb_t, lbmax=lbmax, sub=sub)).astype(np.int64)
        qpad, la = dk._encode_query_rows(q)
        try:
            got = np.asarray(run_sq16(
                jnp.asarray(qpad), jnp.array([la], jnp.int32), b16, lb16,
                sub=sub, lbmax=lbmax)).reshape(-1).astype(np.int64)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"check": f"i16_la{la_q}",
                              "error": str(e)[:3000]}), flush=True)
            return
        ok = bool((got == want).all())
        print(json.dumps({"check": f"i16_la{la_q}", "ok": ok,
                          "mism": int((got != want).sum())}), flush=True)
        if not ok:
            return

    # --- throughput at the bench shape ---
    B = 1 << 18
    lensb = np.full(B, LB)
    charsb = rng.integers(97, 123, (B, LB)).astype(np.int32)
    qs = [np.asarray(rng.integers(97, 123, LB), np.int32) for _ in range(97)]

    def sync(out):
        np.asarray(out.ravel()[:1])

    for sub_t in (16, 32, 8):
        b_cols, lb_t, lbm = dk.prepare_corpus_seq(charsb, lensb, sub=sub_t,
                                                  lbmax=LB)
        b_d = jax.device_put(jnp.asarray(b_cols.astype(np.int16)))
        lb_d = jax.device_put(jnp.asarray(lb_t.astype(np.int16)))
        qit = itertools.cycle(qs)

        def call():
            qp, la_ = dk._encode_query_rows(next(qit))
            return run_sq16(jnp.asarray(qp), jnp.array([la_], jnp.int32),
                            b_d, lb_d, sub=sub_t, lbmax=lbm)

        try:
            t0 = time.perf_counter()
            sync(call())
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": f"i16_sub{sub_t}",
                              "error": str(e)[:400]}), flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = call()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(json.dumps({"mode": f"i16_sub{sub_t}",
                          "compile_s": round(compile_s, 1),
                          "ms": round(best * 1e3, 3),
                          "pairs_per_s": round(B / best)}), flush=True)


if __name__ == "__main__":
    main()
