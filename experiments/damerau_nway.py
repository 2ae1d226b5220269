"""NWAY-interleave probe for the Damerau row kernel.

Honest timing (the axon relay pipelines `block_until_ready`, so each call
fetches a scalar sum; queries never repeat so no relay memoization).

Finding that motivates this: the row step's ~50 tile ops form ONE serial
dependence chain — Mosaic issues them ~1 native (8,128) op/cycle with no
ILP, so op-count ablations barely move the time (core-only ~= full).
Interleaving NWAY independent candidate tiles' chains in one loop body
gives the scheduler independent ops to dual/multi-issue.

Run on the TPU:  python experiments/damerau_nway.py
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

LANE, SEG, ROWS = 128, 64, 64
BIG = np.int32(1 << 23)


def _kernel(q_ref, b_ref, out_ref, st_ref, *, sub: int, nway: int):
    jj = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    local = jj & (SEG - 1)
    jcol = local + 1
    shifts = [1, 2, 4, 8, 16, 32]
    SENT = jnp.int32(int(BIG) << 7)

    def shift_seg(x, sh, fill):
        r = pltpu.roll(x, sh, 1)
        return jnp.where(local >= sh, r, fill)

    b_tiles = [b_ref[n] for n in range(nway)]
    for n in range(nway):
        st_ref[4 * n + 0] = jcol
        st_ref[4 * n + 1] = jnp.full((sub, LANE), BIG, jnp.int32)
        st_ref[4 * n + 2] = jnp.zeros((sub, LANE), jnp.int32)
        st_ref[4 * n + 3] = jnp.full((sub, LANE), BIG, jnp.int32)

    def step(i, carry):
        ai = q_ref[i - 1]
        sts = [[st_ref[4 * n + k] for k in range(4)] for n in range(nway)]
        outs = []
        # one pipeline stage at a time across all NWAY chains, so adjacent
        # instructions come from independent chains
        eq = [b_tiles[n] == ai for n in range(nway)]
        d2f = jnp.where(i >= 2, i - 2, BIG)
        d2up = [shift_seg(sts[n][1], 1, d2f) for n in range(nway)]
        e = [jnp.where(eq[n], (d2up[n] << 7) | jcol, SENT)
             for n in range(nway)]
        for sh in shifts:
            e = [jnp.where((e[n] & 127) > 0, e[n],
                           shift_seg(e[n], sh, SENT)) for n in range(nway)]
        es = [shift_seg(e[n], 1, SENT) for n in range(nway)]
        L = [es[n] & 127 for n in range(nway)]
        t = [jnp.where(L[n] >= 1, es[n] >> 7, BIG) for n in range(nway)]
        diag = [shift_seg(sts[n][0], 1, i - 1) for n in range(nway)]
        cand = [jnp.minimum(diag[n] + jnp.where(eq[n], 0, 1),
                            sts[n][0] + 1) for n in range(nway)]
        for n in range(nway):
            K, FR = sts[n][2], sts[n][3]
            case1 = jnp.where(jcol - L[n] == 1, FR + (i - K), BIG)
            case2 = jnp.where((i - K == 1) & (jcol - L[n] != 1),
                              t[n] + (jcol - L[n]), BIG)
            tr = jnp.minimum(case1, case2)
            c = jnp.where(eq[n], cand[n], jnp.minimum(cand[n], tr))
            outs.append(jnp.minimum(c, i + jcol))
        y = [outs[n] - jcol for n in range(nway)]
        for sh in shifts:
            y = [jnp.minimum(y[n], shift_seg(y[n], sh, BIG))
                 for n in range(nway)]
        for n in range(nway):
            new = y[n] + jcol
            dim1 = sts[n][0]
            r2 = pltpu.roll(dim1, 2, 1)
            dim1_m2 = jnp.where(local >= 2, r2,
                                jnp.where(jcol == 2, i - 1, BIG))
            st_ref[4 * n + 3] = jnp.where(eq[n], dim1_m2, sts[n][3])
            st_ref[4 * n + 2] = jnp.maximum(sts[n][2],
                                            jnp.where(eq[n], i, 0))
            st_ref[4 * n + 1] = dim1
            st_ref[4 * n + 0] = new
        return carry

    jax.lax.fori_loop(1, ROWS + 1, step, 0)
    for n in range(nway):
        out_ref[n] = st_ref[4 * n]


@functools.partial(jax.jit, static_argnames=("sub", "nway"))
def run(q, b4, *, sub, nway):
    nblocks = b4.shape[0] // nway
    return pl.pallas_call(
        functools.partial(_kernel, sub=sub, nway=nway),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nway, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nway, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b4.shape[0], sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4 * nway, sub, LANE), jnp.int32)],
    )(q, b4)


def main():
    rng = np.random.default_rng(7)
    rows = (1 << 16) // 2                      # 64k pairs at 2/row
    qs = [jnp.asarray(rng.integers(97, 123, ROWS).astype(np.int32))
          for _ in range(97)]
    import itertools
    ks = itertools.cycle(range(len(qs)))       # 97 prime: no repeat pattern

    for sub, nway in ((512, 1), (512, 2), (512, 4), (256, 4), (256, 8)):
        ntile = rows // sub
        b4 = jax.device_put(jnp.asarray(
            rng.integers(97, 123, (ntile, sub, LANE)).astype(np.int32)))
        s = jax.jit(functools.partial(
            lambda qq, bb, sub, nway: run(qq, bb, sub=sub, nway=nway).sum(),
            sub=sub, nway=nway))
        try:
            int(s(qs[next(ks)], b4))
        except Exception as exc:
            print(json.dumps({"sub": sub, "nway": nway,
                              "error": str(exc)[:160]}), flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                int(s(qs[next(ks)], b4))
            best = min(best, (time.perf_counter() - t0) / 4)
        print(json.dumps({"sub": sub, "nway": nway,
                          "ms": round(best * 1e3, 3),
                          "Mpairs": round(2 * rows / best / 1e6, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
