"""Probe: can the fast band kernel's per-step tables live un-broadcast?

Today ``build_shifted_tables`` broadcasts each (1, LANE) table row to
(sub, LANE) because ``tpu.dynamic_gather`` wants operand shape == index
shape.  If an in-kernel ``jnp.broadcast_to`` before the gather lowers
cleanly, table VMEM drops ``sub``x (32x), unlocking longer buckets and
multi-word bands.  Measures correctness + speed vs the shipped kernel.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidfuzz_tpu.ops.pallas import band_kernel as bk
from rapidfuzz_tpu.ops.pallas.lev_kernel import LANE, SUB, prepare_corpus


def _fast_kernel_slim(scal_ref, probe_ref, tab_ref, cand_ref, lb_ref,
                      out_ref, *, LB, ntab, sub):
    la = scal_ref[0]
    cut = scal_ref[1]
    lb = lb_ref[:, :]
    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    vp0 = ones_t << jnp.uint32(31 - bk.MAX_CUTOFF)
    vn0 = jnp.zeros((sub, LANE), jnp.uint32)
    dist0 = jnp.full((sub, LANE), bk.MAX_CUTOFF, jnp.int32)

    def one_step(j, row, u, state):
        dist, vp, vn = state
        c = ((row >> jnp.uint32(8 * u)) & jnp.uint32(0xFF)).astype(jnp.int32)
        if ntab == 2:
            c_lo = jnp.where(c < LANE, c, c - LANE)
            t0 = jnp.broadcast_to(tab_ref[j * ntab], (sub, LANE))
            t1 = jnp.broadcast_to(tab_ref[j * ntab + 1], (sub, LANE))
            x = jnp.where(c >= LANE,
                          jnp.take_along_axis(t1, c_lo, axis=1),
                          jnp.take_along_axis(t0, c_lo, axis=1))
        else:
            t0 = jnp.broadcast_to(tab_ref[j], (sub, LANE))
            x = jnp.take_along_axis(t0, c, axis=1)
        d0 = (((x & vp) + vp) ^ vp) | x | vn
        hp = vn | ~(d0 | vp)
        hn = d0 & vp
        probe = probe_ref[j, 0]
        diag_delta = 1 - ((d0 >> 31) & 1).astype(jnp.int32)
        hor_delta = ((hp & probe) != 0).astype(jnp.int32) \
            - ((hn & probe) != 0).astype(jnp.int32)
        delta = jnp.where(probe != 0, hor_delta, diag_delta)
        dist = jnp.where(j < lb, dist + delta, dist)
        nvp = hn | ~((d0 >> 1) | hp)
        vn = (d0 >> 1) & hp
        return dist, nvp, vn

    state = (dist0, vp0, vn0)
    for jj in range(LB // 4):
        row = cand_ref[jj]
        for u in range(4):
            state = one_step(jj * 4 + u, row, u, state)
    dist, _, _ = state
    dist = jnp.where(lb == 0, la, dist)
    dist = jnp.where(jnp.abs(la - lb) > cut, bk.BIG, dist)
    dist = jnp.where(dist > cut, bk.BIG, dist)
    out_ref[:, :] = dist


@functools.partial(jax.jit, static_argnames=("LB", "ntab", "sub"))
def run_slim(scal, probe, tabs, cand3, lb2, *, LB, ntab, sub=SUB):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_fast_kernel_slim, LB=LB, ntab=ntab, sub=sub)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((LB * ntab, 1, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB // 4, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
    )(scal, probe, tabs, cand3, lb2)


def main():
    LEN = 64
    B = 1 << 20
    rng = np.random.default_rng(0)
    query = rng.integers(97, 123, LEN, dtype=np.int32)
    chars = rng.integers(97, 123, (B, LEN)).astype(np.int32)
    cand3, _ = prepare_corpus(jnp.asarray(chars),
                              jnp.full((B,), LEN, jnp.int32), LB=LEN)
    cand3 = jax.block_until_ready(cand3)
    lb2 = jnp.full((B // 128, 128), LEN, jnp.int32)
    mode = "byte"
    ntab = 2
    cut = 15

    # LANDED: build_shifted_tables now emits slim rows natively; the
    # shipped kernel and the local copy both consume them.
    stabs_slim = jnp.asarray(bk.build_shifted_tables(query, mode, LEN, bw=1))
    stabs_full = stabs_slim
    probe = jnp.asarray(bk.probe_table(LEN, LEN, bw=1))
    scal = jnp.array([LEN, cut], jnp.int32)
    jax.block_until_ready((stabs_full, stabs_slim, probe))

    t0 = time.time()
    ref = bk._run_fast(scal, probe, stabs_full, cand3, lb2, LB=LEN,
                       ntab=ntab, bw=1)
    np.asarray(ref[:1, :1]); print(f"ref compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    got = run_slim(scal, probe, stabs_slim, cand3, lb2, LB=LEN, ntab=ntab)
    np.asarray(got[:1, :1]); print(f"slim compile+run {time.time()-t0:.1f}s")
    same = bool(jnp.all(ref == got))
    print("EQUAL:", same)

    def rate(fn, *args, **kw):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*args, **kw)
            np.asarray(out[:1, :1])
            best = min(best, (time.perf_counter() - t0) / 10)
        return B / best

    r_ref = rate(bk._run_fast, scal, probe, stabs_full, cand3, lb2,
                 LB=LEN, ntab=ntab, bw=1)
    r_slim = rate(run_slim, scal, probe, stabs_slim, cand3, lb2,
                  LB=LEN, ntab=ntab)
    print(f"ref  {r_ref/1e9:.3f} G pairs/s")
    print(f"slim {r_slim/1e9:.3f} G pairs/s  ({r_slim/r_ref:.2f}x)")


if __name__ == "__main__":
    main()
