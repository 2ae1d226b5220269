"""Pallas TPU kernel: one-vs-many *weighted* Levenshtein (Wagner-Fischer).

The reference's generalized kernel (``/root/reference/src/distance/
levenshtein.rs:212-259``) is a one-row O(N·M) DP with per-operation costs
``{insertion, deletion, substitution}``; the algebraic special cases
(ins==del==0 → 0, uniform×k, sub ≥ ins+del → indel×k,
``levenshtein.rs:1244-1279``) are applied by the host layer so this kernel
only runs for genuinely weighted tables.

Design: candidates tiled as (sub, 128) lanes like :mod:`lev_kernel`; the
DP row ``D[0..la]`` is a tuple of ``la+1`` i32 tiles carried through a
``fori_loop`` over text chars, with the row update unrolled over pattern
positions (the in-row dependency ``cur[p-1] → cur[p]`` is the classic
Wagner-Fischer chain).  The pattern chars are baked per compilation is NOT
possible (they are runtime data), so equality uses the same PM-table
gather as the bit-parallel kernels: ``P[p] == c  iff  PM[c] bit p`` —
one gather per text char, then static bit tests per pattern position.

Cost: ~6 VPU ops per (pattern pos × text char) per 4096-pair tile, i.e.
O(la·lb) like the reference — use only when weights demand it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lev_kernel import LANE, SUB, build_pm_tables

BIG = np.int32(1 << 29)


def _kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref, *, LA: int,
            LB: int, W: int, ntab: int, sub: int):
    la = scal_ref[0]
    ins = scal_ref[1]
    dele = scal_ref[2]
    subc = scal_ref[3]
    lb = lb_ref[:, :]

    # row init: D[p] = p * del for p <= la, +inf beyond (positions past the
    # pattern length must never win the final min)
    pidx = [jnp.full((sub, LANE), p, jnp.int32) for p in range(LA + 1)]
    row = [jnp.where(pidx[p] <= la, pidx[p] * dele, BIG)
           for p in range(LA + 1)]

    def body(j, state):
        row = list(state)
        prow = cand_ref[j // 4]
        c = ((prow >> (8 * (j % 4)).astype(jnp.uint32))
             & jnp.uint32(0xFF)).astype(jnp.int32)
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None
        pm = []
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pm.append(jnp.where(chi, t1, t0))
            else:
                pm.append(t0)

        active = j < lb
        diag = row[0]
        row0 = row[0] + jnp.where(active, ins, 0)
        nrow = [row0]
        prev = row0
        for p in range(1, LA + 1):
            eq = (pm[(p - 1) // 32] >> jnp.uint32((p - 1) % 32)) & 1
            s = diag + jnp.where(eq != 0, 0, subc)
            d = jnp.minimum(jnp.minimum(row[p] + ins, prev + dele), s)
            d = jnp.where(active, d, row[p])
            diag = row[p]
            nrow.append(d)
            prev = d
        return tuple(nrow)

    row = jax.lax.fori_loop(0, jnp.max(lb), body, tuple(row))
    # result = D[la]: select the la-th entry (dynamic) via masked min —
    # entries past la are BIG + monotone row, so min over p == la is exact
    out = jnp.full((sub, LANE), BIG, jnp.int32)
    for p in range(LA + 1):
        out = jnp.where(pidx[p] == la, row[p], out)
    out_ref[:, :] = out


@functools.partial(jax.jit,
                   static_argnames=("LA", "LB", "W", "ntab", "sub",
                                    "interpret"))
def _run(scal, tabs, cand3, lb2, *, LA, LB, W, ntab, sub=SUB,
         interpret=False):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LA=LA, LB=LB, W=W, ntab=ntab, sub=sub)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * ntab, sub, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB // 4, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        interpret=interpret,
    )(scal, tabs, cand3, lb2)


def wlev_1v_many(query: np.ndarray, cand3, lb2, *, ins: int, dele: int,
                 sub_cost: int, mode: str = "byte", tile_sub: int = SUB,
                 interpret: bool = False) -> jnp.ndarray:
    """One-vs-many weighted Levenshtein distances -> [B/128, 128] i32.

    ``query`` is the pattern (deletion applies to its chars); candidates
    come from :func:`lev_kernel.prepare_corpus`.  The pattern length is
    bucketed to a multiple of 32 per compilation (LA); weights are SMEM
    scalars so one compilation serves every weight table of a bucket.
    """
    q = np.asarray(query)
    la = int(q.size)
    LBc = int(cand3.shape[0]) * 4
    if la * max(dele, sub_cost, 1) + LBc * max(ins, sub_cost, 1) >= 2 ** 31:
        raise ValueError("weight table too large for the int32 device DP; "
                         "use the scalar API for costs of this magnitude")
    if la == 0:
        return (jnp.broadcast_to(lb2, lb2.shape) * np.int32(ins)).astype(
            jnp.int32)
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    LA = W * 32
    ntab = 2 if mode == "byte" else 1
    tabs = build_pm_tables(q, mode, tile_sub)
    scal = jnp.array([la, ins, dele, sub_cost], jnp.int32)
    return _run(scal, jnp.asarray(tabs), cand3, lb2, LA=LA, LB=LB, W=W,
                ntab=ntab, sub=tile_sub, interpret=interpret)
