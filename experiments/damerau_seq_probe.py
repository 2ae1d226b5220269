"""Probe: sequential-pair Damerau kernel (pairs-in-lanes, zero lane scans).

The production kernels put DP columns on the lane axis, which forces two
log2(SEG)-step Hillis-Steele scans per row (last-match + min-plus) — the
ablation (damerau_ablate.py) showed those scans cost ~60% and cap any
positions-in-lanes design at ~8.7M pairs/s.  This probe transposes the
layout: **each lane owns one whole pair** and the DP runs fully
sequentially over (i, j) — every op is elementwise, the scans vanish.

Per DP cell: ~20 ALU ops + 5 VMEM loads + 3 stores on (SUB,128) tiles.
At len 64x64 that is ~4096 steps per row-group covering SUB*128 pairs,
~100K elem-ops/pair vs ~274K for the lane-transposed kernel — model
predicts 15-40M pairs/s depending on issue packing.

Semantics: identical Lowrance-Wagner algebra to ops/pallas/damerau_kernel
(case1/case2 + running-min left propagation), re-derived sequentially:
the min-plus lane scan becomes the `d_left + 1` register carry, the
last-match scan becomes the per-row (reg_l, reg_t) register pair.

Run on the TPU:  python -u experiments/damerau_seq_probe.py
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


def _kernel_sq(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
               kk_ref, *, sub: int, lbmax: int, dt=jnp.int32):
    la = la_ref[0]
    lb = lb_ref[0]
    big = 1 << 12 if dt == jnp.int16 else int(BIG)
    zeros = jnp.zeros((sub, LANE), dt)
    bigs = jnp.full((sub, LANE), big, dt)

    # D[0][jcol] = jcol in buffer 0; D[-1] = BIG in buffer 1
    for j in range(lbmax):
        dp_ref[0, j] = zeros + (j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        kk_ref[j] = zeros

    def row(i, carry):
        par = i & 1                       # D[i] overwrites D[i-2] (same par)
        ai = q_ref[i - 1]
        ii = (jnp.zeros((sub, LANE), jnp.int32) + i).astype(dt)
        d_left = ii                       # D[i][0] = i
        d_diag = ii - 1                   # D[i-1][jcol-1] at jcol=1
        d_diag_prev = bigs                # D[i-1][jcol-2] (none at jcol=1)
        d2_left = jnp.where(i >= 2, ii - 2, bigs)           # D[i-2][0]
        reg_l = zeros                     # last col < jcol with b==a_i
        reg_t = bigs                      # D[i-2][reg_l - 1]
        for j in range(lbmax):
            jcol = j + 1
            c2 = b_ref[j]
            eq = c2 == ai
            d_up = dp_ref[1 - par, j]     # D[i-1][jcol]
            d2 = dp_ref[par, j]           # D[i-2][jcol] (read before write)
            fr = fr_ref[j]
            k = kk_ref[j]
            cost = jnp.where(eq, 0, 1).astype(dt)
            cand = jnp.minimum(d_diag + cost,
                               jnp.minimum(d_up, d_left) + 1)
            djL = jcol - reg_l
            iK = ii - k
            m1 = djL == 1
            tr = jnp.where(m1, fr + iK, reg_t + djL)
            tr = jnp.where(m1 | (iK == 1), tr, big)
            new = jnp.minimum(cand, jnp.where(eq, big, tr))
            fr_ref[j] = jnp.where(eq, d_diag_prev, fr)
            kk_ref[j] = jnp.where(eq, ii, k)
            reg_t = jnp.where(eq, d2_left, reg_t)
            reg_l = jnp.where(eq, jnp.asarray(jcol, dt), reg_l)
            dp_ref[par, j] = new
            d_left = new
            d_diag_prev = d_diag
            d_diag = d_up
            d2_left = d2
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    res = jnp.zeros((sub, LANE), jnp.int32) + la      # lb == 0 -> la
    parf = la & 1
    for j in range(lbmax):
        res = jnp.where(lb == j + 1, dp_ref[parf, j].astype(jnp.int32), res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "interpret",
                                             "dt"))
def run_sq(q, la, b_cols, lb_t, *, sub, lbmax, interpret=False,
           dt=jnp.int32):
    nblocks = b_cols.shape[0] // lbmax
    kern = functools.partial(_kernel_sq, sub=sub, lbmax=lbmax, dt=dt)
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
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, lbmax, sub, LANE), dt),
                        pltpu.VMEM((lbmax, sub, LANE), dt),
                        pltpu.VMEM((lbmax, sub, LANE), dt)],
        interpret=interpret,
    )(q, la, b_cols, lb_t)


def prepare_seq(chars: np.ndarray, lens: np.ndarray, sub: int, lbmax: int):
    """[B, LB] i32 corpus -> (b_cols [nb*lbmax, sub, 128], lb [nb, sub, 128]).

    Pair c sits at (block c // (sub*128), sublane (c % (sub*128)) // 128,
    lane c % 128); char j of the pair at leading row ``block*lbmax + j``.
    """
    B, LB = chars.shape
    assert LB <= lbmax and B % (sub * LANE) == 0
    nb = B // (sub * LANE)
    b = np.full((nb, sub, LANE, lbmax), -2, np.int32)
    b[..., :LB] = np.where(chars < 0, -2, chars).reshape(nb, sub, LANE, LB)
    b_cols = b.transpose(0, 3, 1, 2).reshape(nb * lbmax, sub, LANE)
    lb_t = lens.astype(np.int32).reshape(nb, sub, LANE)
    return np.ascontiguousarray(b_cols), np.ascontiguousarray(lb_t)


def main():
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(7)
    LB = 64

    # --- correctness vs the production lane-transposed kernel ---
    sub = 8
    B = sub * LANE * 2
    lens = rng.integers(0, LB + 1, B)
    lens[:4] = [0, 1, LB, LB]
    chars = np.full((B, LB), -1, np.int64)
    for c in range(B):
        chars[c, :lens[c]] = rng.integers(97, 105, lens[c])   # 8-char alpha
    q = rng.integers(97, 105, LB).astype(np.int32)
    qpad, la = dk._encode_query_rows(q)

    b_cols, lb_t = prepare_seq(chars.astype(np.int32), lens, sub, LB)
    got = np.asarray(run_sq(jnp.asarray(qpad), jnp.array([la], jnp.int32),
                            jnp.asarray(b_cols), jnp.asarray(lb_t),
                            sub=sub, lbmax=LB)).reshape(-1)
    bt, lbt2, seg = dk.prepare_corpus_cols(
        np.where(chars < 0, -2, chars).astype(np.int32), lens, seg=64)
    want = np.asarray(dk.damerau_1v_many(q, bt, lbt2, seg=seg))
    ok = bool((got == want).all())
    print(json.dumps({"check": "seq_vs_prod", "ok": ok,
                      "mismatches": int((got != want).sum())}), flush=True)
    if not ok:
        bad = np.nonzero(got != want)[0][:5]
        for c in bad:
            print(dict(c=int(c), got=int(got[c]), want=int(want[c]),
                       len=int(lens[c])))
        return

    # --- throughput at the bench shape ---
    B = 1 << 18
    lensb = np.full(B, LB)
    charsb = rng.integers(97, 123, (B, LB)).astype(np.int32)
    qs = [np.asarray(rng.integers(97, 123, LB), np.int32) for _ in range(97)]

    def sync(out):
        np.asarray(out.ravel()[:1])

    for sub_t, dt in ((8, jnp.int32), (16, jnp.int32), (32, jnp.int32),
                      (16, jnp.int16), (32, jnp.int16)):
        b_cols, lb_t = prepare_seq(charsb, lensb, sub_t, LB)
        b_d = jax.device_put(jnp.asarray(b_cols))
        lb_d = jax.device_put(jnp.asarray(lb_t))
        qit = itertools.cycle(qs)

        def call():
            qp, la_ = dk._encode_query_rows(next(qit))
            return run_sq(jnp.asarray(qp), jnp.array([la_], jnp.int32),
                          b_d, lb_d, sub=sub_t, lbmax=LB, dt=dt)

        try:
            sync(call())
        except Exception as e:  # noqa: BLE001 — Mosaic may reject i16
            print(json.dumps({"mode": f"seq_sub{sub_t}_{dt.__name__}",
                              "error": str(e)[:160]}), flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = call()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(json.dumps({"mode": f"seq_sub{sub_t}_{dt.__name__}",
                          "ms": round(best * 1e3, 3),
                          "pairs_per_s": round(B / best)}), flush=True)


if __name__ == "__main__":
    main()
