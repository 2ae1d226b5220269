"""Probe: row-fused sequential-pair Damerau (2 and 4 rows per j-pass).

The production `_kernel_sq` (pairs in lanes, sequential (i,j) DP) pays
5 VMEM loads + 3 stores per DP cell.  Fusing R consecutive rows into one
column pass makes the inter-row structures register-carried:

  R=2: per column j the pass loads b, D[i-1][j], D[i-2][j], FR[j], K[j]
       (5) and stores D[i][j], D[i+1][j], FR'[j], K'[j] (4) — 4.5 VMEM
       ops per 2 cells vs 8 per cell.
  R=4: rows i..i+3; D[i]/D[i+1] feed D[i+2]/D[i+3] in registers, only
       the last two rows + FR/K are stored — 9 VMEM ops per 4 cells.

Because DP rows start at i=1 and pairs advance by R, buffer parity is
CONSTANT across fused passes (odd row writes dp[1], even dp[0]), so the
`1 - par` indexing goes away.  Remainder rows (la % R) run the existing
one-row body.

Semantics: identical Zhao-Sahni algebra to ops/pallas/damerau_kernel
`_kernel_sq` (damerau_levenshtein.rs:111-168); per-row transposition
registers (reg_l, reg_t) and the FR/K chain are updated in row order
inside the fused pass, which preserves the exact read-after-update
ordering of the sequential form.

Run on the TPU:  python -u experiments/damerau_rowfuse_probe.py
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


class _RowRegs:
    """Register set for one DP row inside a fused pass."""

    __slots__ = ("d_left", "d_diag", "d_diag_prev", "d2_left", "reg_l",
                 "reg_t")

    def __init__(self, i, zeros, bigs, d2_left):
        self.d_left = zeros + i
        self.d_diag = zeros + (i - 1)
        self.d_diag_prev = bigs
        self.d2_left = d2_left
        self.reg_l = zeros
        self.reg_t = bigs


def _cell(regs, i, jcol, eq, d_up, d2, fr, k, bigs):
    """One DP cell on registers; returns (new, fr', k') and advances regs."""
    cost = jnp.where(eq, 0, 1)
    cand = jnp.minimum(regs.d_diag + cost,
                       jnp.minimum(d_up, regs.d_left) + 1)
    djL = jcol - regs.reg_l
    iK = i - k
    m1 = djL == 1
    tr = jnp.where(m1, fr + iK, regs.reg_t + djL)
    tr = jnp.where(m1 | (iK == 1), tr, BIG)
    new = jnp.minimum(cand, jnp.where(eq, BIG, tr))
    fr_n = jnp.where(eq, regs.d_diag_prev, fr)
    k_n = jnp.where(eq, jnp.zeros_like(k) + i, k)
    regs.reg_t = jnp.where(eq, regs.d2_left, regs.reg_t)
    regs.reg_l = jnp.where(eq, jcol, regs.reg_l)
    regs.d_left = new
    regs.d_diag_prev = regs.d_diag
    regs.d_diag = d_up
    regs.d2_left = d2
    return new, fr_n, k_n


def _kernel_fuse(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
                 kk_ref, *, sub: int, lbmax: int, R: int):
    la = la_ref[0]
    lb = lb_ref[0]
    zeros = jnp.zeros((sub, LANE), jnp.int32)
    bigs = jnp.full((sub, LANE), BIG, jnp.int32)

    for j in range(lbmax):
        dp_ref[0, j] = zeros + (j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        kk_ref[j] = zeros

    def fused(t, carry):
        i0 = 1 + R * t                    # first row of the group (odd when
        rows = []                         # R is even: parity is static)
        ais = [q_ref[i0 - 1 + r] for r in range(R)]
        for r in range(R):
            i = i0 + r
            d2l = (jnp.where(i >= 2, zeros + (i - 2), bigs)
                   if r == 0 else zeros + (i - 2))
            rows.append(_RowRegs(i, zeros, bigs, d2l))
        for j in range(lbmax):
            jcol = j + 1
            c2 = b_ref[j]
            d_up = dp_ref[0, j]           # D[i0-1][jcol]  (even buffer)
            d2 = dp_ref[1, j]             # D[i0-2][jcol]  (odd buffer)
            fr = fr_ref[j]
            k = kk_ref[j]
            news = []
            for r in range(R):
                new, fr, k = _cell(rows[r], i0 + r, jcol, c2 == ais[r],
                                   d_up, d2, fr, k, bigs)
                d2 = d_up
                d_up = new
                news.append(new)
            dp_ref[1, j] = news[-2]       # row i0+R-2 is odd when R even
            dp_ref[0, j] = news[-1]
            fr_ref[j] = fr
            kk_ref[j] = k
        return carry

    def single(i, carry):
        par = i & 1
        ai = q_ref[i - 1]
        regs = _RowRegs(i, zeros, bigs,
                        jnp.where(i >= 2, zeros + (i - 2), bigs))
        for j in range(lbmax):
            jcol = j + 1
            eq = b_ref[j] == ai
            d_up = dp_ref[1 - par, j]
            d2 = dp_ref[par, j]
            new, fr_n, k_n = _cell(regs, i, jcol, eq, d_up, d2,
                                   fr_ref[j], kk_ref[j], bigs)
            fr_ref[j] = fr_n
            kk_ref[j] = k_n
            dp_ref[par, j] = new
        return carry

    ngroups = la // R
    jax.lax.fori_loop(0, ngroups, fused, 0)
    jax.lax.fori_loop(R * ngroups + 1, la + 1, single, 0)

    res = zeros + la
    parf = la & 1
    for j in range(lbmax):
        res = jnp.where(lb == j + 1, dp_ref[parf, j], res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "R",
                                             "interpret"))
def run_fuse(q, la, b_cols, lb_t, *, sub, lbmax, R, interpret=False):
    nblocks = b_cols.shape[0] // lbmax
    kern = functools.partial(_kernel_fuse, sub=sub, lbmax=lbmax, R=R)
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
        scratch_shapes=[pltpu.VMEM((2, lbmax, sub, LANE), jnp.int32),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int32),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int32)],
        interpret=interpret,
    )(q, la, b_cols, lb_t)


def main():
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(11)
    LB = 64
    sub = 8
    B = sub * LANE * 2

    # --- correctness vs the production seq kernel, incl. odd/short la ---
    lens = rng.integers(0, LB + 1, B)
    lens[:4] = [0, 1, LB, LB]
    chars = np.full((B, LB), -1, np.int64)
    for c in range(B):
        chars[c, :lens[c]] = rng.integers(97, 105, lens[c])
    b_cols, lb_t, lbmax = dk.prepare_corpus_seq(
        np.where(chars < 0, -2, chars).astype(np.int32), lens, sub=sub,
        lbmax=LB)
    for la_q in (1, 2, 3, 5, 63, 64):
        q = rng.integers(97, 105, la_q).astype(np.int32)
        want = np.asarray(dk.damerau_seq_1v_many(
            q, b_cols, lb_t, lbmax=lbmax, sub=sub)).astype(np.int64)
        qpad, la = dk._encode_query_rows(q)
        for R in (2, 4):
            got = np.asarray(run_fuse(
                jnp.asarray(qpad), jnp.array([la], jnp.int32),
                jnp.asarray(b_cols), jnp.asarray(lb_t), sub=sub,
                lbmax=lbmax, R=R)).reshape(-1)
            ok = bool((got == want).all())
            print(json.dumps({"check": f"R{R}_la{la_q}", "ok": ok,
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

    for sub_t, R in ((16, 1), (16, 2), (16, 4), (32, 2), (8, 4)):
        b_cols, lb_t, lbm = dk.prepare_corpus_seq(charsb, lensb, sub=sub_t,
                                                  lbmax=LB)
        b_d = jax.device_put(jnp.asarray(b_cols))
        lb_d = jax.device_put(jnp.asarray(lb_t))
        qit = itertools.cycle(qs)

        def call():
            qp, la_ = dk._encode_query_rows(next(qit))
            if R == 1:
                return dk._run_sq(jnp.asarray(qp),
                                  jnp.array([la_], jnp.int32), b_d, lb_d,
                                  sub=sub_t, lbmax=lbm)
            return run_fuse(jnp.asarray(qp), jnp.array([la_], jnp.int32),
                            b_d, lb_d, sub=sub_t, lbmax=lbm, R=R)

        try:
            t0 = time.perf_counter()
            sync(call())
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": f"sub{sub_t}_R{R}",
                              "error": str(e)[:200]}), flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = call()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(json.dumps({"mode": f"sub{sub_t}_R{R}",
                          "compile_s": round(compile_s, 1),
                          "ms": round(best * 1e3, 3),
                          "pairs_per_s": round(B / best)}), flush=True)


if __name__ == "__main__":
    main()
