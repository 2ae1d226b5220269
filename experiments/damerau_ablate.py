"""Ablation probe: where does the Damerau pack-kernel row step spend time?

Runs the real pack-kernel row loop with components knocked out (semantics
intentionally broken — timing only):

  full      the production step (_kernel's math, seg=64)
  noscan2   last-match packed Hillis-Steele scan removed (L/t constant)
  noscan1   min-plus prefix scan removed (new = cand)
  noscans   both scans removed
  core      scans + tr logic removed (plain Levenshtein row: diag/up only)
  i16       `core` with int16 tiles — currently fails to compile (Mosaic:
            "Only i1 and i32 scalars are supported"; loop scalars would
            all need broadcast-then-convert), kept for when it lands

Run on the TPU:  python experiments/damerau_ablate.py
"""

import functools
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
SUB = 512
SEG = 64
ROWS = 64
BIG = np.int32(1 << 23)


def _kernel(q_ref, b_ref, out_ref, st_ref, *, mode: str):
    dt = jnp.int16 if mode == "i16" else jnp.int32
    big = jnp.asarray(1 << 12 if mode == "i16" else int(BIG), dt)
    b_tile = b_ref[:, :]
    jj = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    local = (jj & (SEG - 1))
    jcol = (local + 1).astype(dt)
    shifts = [1, 2, 4, 8, 16, 32]
    SENT = jnp.int32(int(BIG) << 7)

    def shift_seg(x, sh, fill):
        r = pltpu.roll(x, sh, 1)
        return jnp.where(local >= sh, r, fill)

    def minplus_prefix(x):
        y = x - jcol
        for sh in shifts:
            y = jnp.minimum(y, shift_seg(y, sh, big))
        return y + jcol

    st_ref[0] = jcol
    st_ref[1] = jnp.full((SUB, LANE), big, dt)
    st_ref[2] = jnp.zeros((SUB, LANE), dt)
    st_ref[3] = jnp.full((SUB, LANE), big, dt)

    def step(i, carry):
        dim1 = st_ref[0]
        dim2 = st_ref[1]
        K = st_ref[2]
        FR = st_ref[3]
        ai = q_ref[i - 1]
        eq_i = b_tile == ai
        ii = i.astype(dt) if dt != jnp.int32 else i

        if mode in ("full", "noscan1"):
            d2fill = jnp.where(i >= 2, i - 2, BIG)
            dim2_up = shift_seg(dim2, 1, d2fill)
            e = jnp.where(eq_i, (dim2_up << 7) | jcol, SENT)
            for sh in shifts:
                e = jnp.where((e & 127) > 0, e, shift_seg(e, sh, SENT))
            es = shift_seg(e, 1, SENT)
            L = es & 127
            t = jnp.where(L >= 1, es >> 7, BIG)
        else:
            L = jcol - 1
            t = dim2

        diag = shift_seg(dim1, 1, ii - 1)
        cost = jnp.where(eq_i, 0, 1).astype(dt)
        cand = jnp.minimum(diag + cost, dim1 + 1)

        if mode != "core" and mode != "i16":
            case1 = jnp.where(jcol - L == 1, FR + (ii - K), big)
            case2 = jnp.where((ii - K == 1) & (jcol - L != 1),
                              t + (jcol - L), big)
            tr = jnp.minimum(case1, case2)
            cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))
        cand = jnp.minimum(cand, ii + jcol)

        if mode in ("full", "noscan2"):
            new = minplus_prefix(cand)
        else:
            new = cand

        r2 = pltpu.roll(dim1, 2, 1)
        dim1_m2 = jnp.where(local >= 2, r2,
                            jnp.where(jcol == 2, ii - 1, big))
        st_ref[3] = jnp.where(eq_i, dim1_m2, FR)
        st_ref[2] = jnp.maximum(K, jnp.where(eq_i, ii, jnp.asarray(0, dt)))
        st_ref[1] = dim1
        st_ref[0] = new
        return carry

    jax.lax.fori_loop(1, ROWS + 1, step, 0)
    out_ref[:, :] = st_ref[0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(q, b_tiles, *, mode):
    dt = jnp.int16 if mode == "i16" else jnp.int32
    nblocks = b_tiles.shape[0] // SUB
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_tiles.shape[0], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, SUB, LANE),
                                   jnp.int16 if mode == "i16" else jnp.int32)],
    )(q, b_tiles)


def main():
    import itertools

    rng = np.random.default_rng(7)
    rows = (1 << 16) // 2                      # 2 candidates per row, seg=64
    b = jnp.asarray(rng.integers(97, 123, (rows, LANE)).astype(np.int32))
    b = jax.device_put(b)
    qs = [jnp.asarray(rng.integers(97, 123, ROWS).astype(np.int32))
          for _ in range(97)]

    def sync(out):
        # block_until_ready is NOT a reliable barrier through the axon
        # tunnel; a one-element device->host fetch is (bench.py._rate).
        # Also: time pipelined windows (enqueue N, fetch once) — a fetch
        # per call measures round-trip latency, not kernel throughput.
        np.asarray(out.ravel()[:1])

    for mode in ("full", "noscan2", "noscan1", "noscans", "core"):
        it = itertools.cycle(qs)
        sync(run(next(it), b, mode=mode))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = run(next(it), b, mode=mode)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(json.dumps({"mode": mode, "ms": round(best * 1e3, 3),
                          "pairs_per_s": round(2 * rows / best)}), flush=True)


if __name__ == "__main__":
    main()
