"""Probe: cheaper cross-block carries for the long Damerau kernel.

`_kernel_long` chains three loop-carried quantities across the NB lane
blocks of each row with five cross-lane reductions per block per row
(`last_lane` x3, `lane_at` x1, `jnp.min` x1) — ROADMAP lead 1 flags them
as ~40% headroom at nb=16.  All five are recoverable without a
reduction:

  * fills consumed only at lanes 0/1 (`shift1`, `dim1_m2`): keep the
    previous block's ORIGINAL dim1/dim2 tiles in registers — `roll(prev,
    sh, 1)` already lands prev[128-sh..] in lanes 0..sh-1, so the fill
    is one roll instead of a reduction + broadcast;
  * all-lane carries (`c_e`, `c_min`): the Hillis-Steele scans are
    prefix scans, so lane 127 of the merged tile IS the block aggregate
    — a lane-127 broadcast (`x[:, 127:128]` splat) replaces the
    masked-sum/min.

Semantics identical to `_kernel_long` (damerau_levenshtein.rs:111-168).

Run on the TPU:  python -u experiments/damerau_long_carries.py
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
BIG = np.int32(1 << 23)


def _kernel_long2(q_ref, la_ref, b_ref, lb_ref, out_ref, d1_ref, d2_ref,
                  k_ref, fr_ref, *, sub: int, nb: int):
    la = la_ref[0]
    local = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    PBIG = jnp.int32(1 << 19)
    SENT = jnp.int32((1 << 19) << 11)
    shifts = [1, 2, 4, 8, 16, 32, 64]
    lb = lb_ref[:, :]

    def bcast_last(x):
        return jnp.broadcast_to(x[:, LANE - 1:LANE], (sub, LANE))

    def shift1x(cur, prev):
        return jnp.where(local >= 1, pltpu.roll(cur, 1, 1),
                         pltpu.roll(prev, 1, 1))

    for b in range(nb):
        d1_ref[b] = jax.lax.broadcasted_iota(
            jnp.int32, (sub, LANE), 1) + b * LANE + 1
        d2_ref[b] = jnp.full((sub, LANE), BIG, jnp.int32)
        k_ref[b] = jnp.zeros((sub, LANE), jnp.int32)
        fr_ref[b] = jnp.full((sub, LANE), BIG, jnp.int32)

    def row(i, carry):
        ai = q_ref[i - 1]
        d2fill = jnp.where(i >= 2, i - 2, BIG)
        # virtual block -1 tiles: lane 127 holds column 0 of each row
        # structure, lane 126 the (nonexistent) column -1
        prev_d1 = jnp.where(local == LANE - 1, i - 1,
                            jnp.full((sub, LANE), BIG, jnp.int32))
        prev_d2 = jnp.full((sub, LANE), 0, jnp.int32) + d2fill
        c_e = jnp.full((sub, LANE), SENT, jnp.int32)
        c_min = jnp.full((sub, LANE), BIG, jnp.int32)
        for b in range(nb):
            jcol = local + (b * LANE + 1)
            dim1 = d1_ref[b]
            dim2 = d2_ref[b]
            K = k_ref[b]
            FR = fr_ref[b]
            b_tile = b_ref[:, b * LANE:(b + 1) * LANE]
            eq_i = b_tile == ai

            dim2_up = shift1x(dim2, prev_d2)
            d2p = jnp.minimum(dim2_up, PBIG)
            e = jnp.where(eq_i, (d2p << 11) | jcol, SENT)
            for sh in shifts:
                r = pltpu.roll(e, sh, 1)
                r = jnp.where(local >= sh, r, SENT)
                e = jnp.where((e & 2047) > 0, e, r)
            e = jnp.where((e & 2047) > 0, e, c_e)          # prior blocks
            es = shift1x(e, c_e)           # last match strictly < jcol
            L = es & 2047
            t = jnp.where(L >= 1, es >> 11, BIG)

            diag = shift1x(dim1, prev_d1)  # D_{i-1}[jcol-1]
            cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
            cand = jnp.minimum(diag + cost, dim1 + 1)
            case1 = jnp.where(jcol - L == 1, FR + (i - K), BIG)
            case2 = jnp.where((i - K == 1) & (jcol - L != 1),
                              t + (jcol - L), BIG)
            tr = jnp.minimum(case1, case2)
            cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))
            cand = jnp.minimum(cand, i + jcol)   # boundary D[i][0] = i

            y = cand - jcol
            for sh in shifts:
                r = pltpu.roll(y, sh, 1)
                r = jnp.where(local >= sh, r, BIG)
                y = jnp.minimum(y, r)
            y = jnp.minimum(y, c_min)
            new = y + jcol

            # D_{i-1}[jcol-2]: two-lane cross-block shift via prev tile
            dim1_m2 = jnp.where(local >= 2, pltpu.roll(dim1, 2, 1),
                                pltpu.roll(prev_d1, 2, 1))

            # carries for the NEXT block: lane-127 broadcasts + prev tiles
            c_e = bcast_last(e)
            c_min = bcast_last(y)
            prev_d1, prev_d2 = dim1, dim2

            fr_ref[b] = jnp.where(eq_i, dim1_m2, FR)
            k_ref[b] = jnp.maximum(K, jnp.where(eq_i, i, 0))
            d2_ref[b] = dim1
            d1_ref[b] = new
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)
    acc = jnp.zeros((sub, LANE), jnp.int32)
    for b in range(nb):
        jcol = local + (b * LANE + 1)
        acc = acc + jnp.where(jcol == lb, d1_ref[b], 0)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("sub", "nb", "interpret"))
def run_long2(q, la, b_tiles, lb_tiles, *, sub, nb, interpret=False):
    nblocks = b_tiles.shape[0] // sub
    kern = functools.partial(_kernel_long2, sub=sub, nb=nb)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sub, nb * LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_tiles.shape[0], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nb, sub, LANE), jnp.int32)
                        for _ in range(4)],
        interpret=interpret,
    )(q, la, b_tiles, lb_tiles)


def main():
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(5)

    # --- correctness vs the production long kernel ---
    LB = 300
    B = 64
    lens = rng.integers(0, LB + 1, B)
    lens[:4] = [0, 1, 129, LB]
    chars = np.full((B, LB), -2, np.int32)
    for c in range(B):
        chars[c, :lens[c]] = rng.integers(97, 103, lens[c])
    b_tiles, lbt, nb, sub = dk.prepare_corpus_long(chars, lens, sub=8)
    q = rng.integers(97, 103, 200).astype(np.int32)
    qpad, la = dk._encode_query_rows(q)
    want = np.sum(np.asarray(dk._run_long(
        jnp.asarray(qpad), jnp.array([la], jnp.int32), jnp.asarray(b_tiles),
        jnp.asarray(lbt), sub=sub, nb=nb)), axis=1)
    got = np.sum(np.asarray(run_long2(
        jnp.asarray(qpad), jnp.array([la], jnp.int32), jnp.asarray(b_tiles),
        jnp.asarray(lbt), sub=sub, nb=nb)), axis=1)
    ok = bool((got == want).all())
    print(json.dumps({"check": "long2_vs_long", "ok": ok,
                      "mism": int((got != want).sum())}), flush=True)
    if not ok:
        bad = np.nonzero(got != want)[0][:5]
        for c in bad:
            print(dict(c=int(c), got=int(got[c]), want=int(want[c]),
                       len=int(lens[c])))
        return

    # --- throughput at the long-bucket shape (2000 chars, like r3 log) ---
    LB = 2000
    B = 4096
    lensb = np.full(B, LB)
    charsb = rng.integers(97, 123, (B, LB)).astype(np.int32)
    b_tiles, lbt, nb, sub = dk.prepare_corpus_long(charsb, lensb)
    b_d = jax.device_put(jnp.asarray(b_tiles))
    lb_d = jax.device_put(jnp.asarray(lbt))
    qs = [np.asarray(rng.integers(97, 123, 2000), np.int32)
          for _ in range(7)]

    def sync(out):
        np.asarray(out.ravel()[:1])

    for name, fn in (("long_prod", dk._run_long), ("long_carries",
                                                   run_long2)):
        qit = itertools.cycle(qs)

        def call():
            qp, la_ = dk._encode_query_rows(next(qit))
            return fn(jnp.asarray(qp), jnp.array([la_], jnp.int32),
                      b_d, lb_d, sub=sub, nb=nb)

        try:
            t0 = time.perf_counter()
            sync(call())
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = call()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        print(json.dumps({"mode": name, "sub": sub, "nb": nb,
                          "compile_s": round(compile_s, 1),
                          "ms": round(best * 1e3, 3),
                          "pairs_per_s": round(B / best)}), flush=True)


if __name__ == "__main__":
    main()
