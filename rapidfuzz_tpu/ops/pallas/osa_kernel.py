"""Pallas TPU kernel: one-vs-many OSA distance (Hyyrö + transposition).

Same tiling/table design as :mod:`lev_kernel` (4096 candidates per grid
cell, dynamic-gather PM tables, unrolled text loop); the recurrence extends
the Myers/Hyyrö step with the reference's transposition term
(``/root/reference/src/distance/osa.rs:84-135`` single word,
``osa.rs:156-227`` multi-word):

    tr = (((~d0_prev) & pm) << 1 | carry from word w-1) & pm_prev
    d0 |= tr

which requires carrying the previous step's ``d0`` and ``pm`` per word —
2W extra registers vs Levenshtein.  As in :mod:`lev_kernel`, state past a
candidate's length is not masked: the distance counter freezes at
``j == lb`` so stale state is irrelevant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lev_kernel import LANE, SUB, build_pm_tables, pick_unroll, unpack_byte


def _kernel(la_ref, tab_ref, cand_ref, lb_ref, out_ref, *, LB: int, W: int,
            ntab: int, unroll: int, sub: int, multiq: bool = False):
    la = la_ref[pl.program_id(1)] if multiq else la_ref[0]
    lb = lb_ref[:, :]
    # W == ceil(la/32) per compilation, so the last word is always W-1
    last_bit = ((la - 1) & 31).astype(jnp.uint32)
    ones = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros = jnp.zeros((sub, LANE), jnp.uint32)

    def one_char(row, u, j, dist, vp, vn, d0p, pmp):
        c = unpack_byte(row, u)
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None
        hp_c = jnp.ones((sub, LANE), jnp.uint32)
        hn_c = jnp.zeros((sub, LANE), jnp.uint32)
        nvp, nvn, nd0, npm = list(vp), list(vn), list(d0p), list(pmp)
        pms = []
        delta = None
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pmw = jnp.where(chi, t1, t0)
            else:
                pmw = t0
            pms.append(pmw)
            tr = (~d0p[w] & pmw) << 1
            if w > 0:
                tr = tr | ((~d0p[w - 1] & pms[w - 1]) >> 31)
            tr = tr & pmp[w]
            x = pmw | hn_c
            vpw, vnw = vp[w], vn[w]
            d0 = ((((x & vpw) + vpw) ^ vpw) | x | vnw) | tr
            hp = vnw | ~(d0 | vpw)
            hn = d0 & vpw
            if w == W - 1:
                delta = (((hp >> last_bit) & 1).astype(jnp.int32)
                         - ((hn >> last_bit) & 1).astype(jnp.int32))
            hp_out = hp >> 31
            hn_out = hn >> 31
            hp_s = (hp << 1) | hp_c
            hn_s = (hn << 1) | hn_c
            nvp[w] = hn_s | ~(d0 | hp_s)
            nvn[w] = hp_s & d0
            nd0[w] = d0
            npm[w] = pmw
            hp_c, hn_c = hp_out, hn_out
        dist = jnp.where(j < lb, dist + delta, dist)
        return dist, nvp, nvn, nd0, npm

    def body(jj, state):
        dist, *rest = state
        vp = list(rest[:W])
        vn = list(rest[W:2 * W])
        d0p = list(rest[2 * W:3 * W])
        pmp = list(rest[3 * W:])
        row = None
        for u in range(unroll):
            if u % 4 == 0:
                row = cand_ref[jj * (unroll // 4) + u // 4]
            dist, vp, vn, d0p, pmp = one_char(row, u, jj * unroll + u,
                                              dist, vp, vn, d0p, pmp)
        return (dist, *vp, *vn, *d0p, *pmp)

    dist0 = jnp.broadcast_to(la, (sub, LANE)).astype(jnp.int32)
    state = (dist0,) + (ones,) * W + (zeros,) * (3 * W)
    trips = (jnp.max(lb) + (unroll - 1)) // unroll
    state = jax.lax.fori_loop(0, trips, body, state)
    if multiq:
        out_ref[0] = state[0]
    else:
        out_ref[:, :] = state[0]


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _run(la, tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
         interpret=False):
    assert unroll % 4 == 0, "packed-row indexing needs unroll % 4 == 0"
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, ntab=ntab, unroll=unroll,
                             sub=sub)
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
    )(la, tabs, cand3, lb2)


def osa_1v_many(query: np.ndarray, cand3, lb2, *, mode: str = "byte",
                staged=None, interpret: bool = False) -> jnp.ndarray:
    """One-vs-many OSA distances -> [B/128, 128] i32.

    ``cand3``/``lb2`` from :func:`lev_kernel.prepare_corpus`.
    """
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        return jnp.broadcast_to(lb2, lb2.shape).astype(jnp.int32)
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    la_arr, tabs = staged if staged is not None else (
        jnp.array([la], jnp.int32), jnp.asarray(build_pm_tables(q, mode)))
    return _run(la_arr, tabs, cand3, lb2,
                LB=LB, W=W, ntab=ntab, unroll=pick_unroll(LB),
                interpret=interpret)


# ------------------------------------------------------------ multi-query

@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _run_nq(las, tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
            interpret=False):
    """NQ queries' OSA distances in one dispatch (the lev kernel's
    ``_run_nq`` pattern: query axis innermost so consecutive grid steps
    share each corpus tile fetch)."""
    assert unroll % 4 == 0
    NQ = las.shape[0]
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, ntab=ntab, unroll=unroll,
                             sub=sub, multiq=True)
    return pl.pallas_call(
        kern,
        grid=(nblocks, NQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * ntab, sub, LANE), lambda i, q: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB // 4, sub, LANE), lambda i, q: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, q: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i, q: (q, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NQ, cand3.shape[1], LANE),
                                       jnp.int32),
        interpret=interpret,
    )(las, tabs, cand3, lb2)


def osa_nq_many(queries, cand3, lb2, *, mode: str = "byte", staged=None,
                interpret: bool = False) -> jnp.ndarray:
    """Many-vs-many OSA distances -> [NQ, B/128, 128] i32.  All queries
    must share one word bucket; empty queries are patched to lb after
    the dispatch (the bit-parallel delta never fires for them)."""
    qs = [np.asarray(q) for q in queries]
    Ws = {max(1, -(-q.size // 32)) for q in qs}
    if len(Ws) != 1:
        raise ValueError(f"queries span word buckets {sorted(Ws)}")
    W = Ws.pop()
    LB = int(cand3.shape[0]) * 4
    ntab = 2 if mode == "byte" else 1
    las, tabs = staged if staged is not None else (
        jnp.array([q.size for q in qs], jnp.int32),
        jnp.asarray(np.concatenate(
            [build_pm_tables(q, mode) for q in qs], axis=0)))
    out = _run_nq(las, tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                  unroll=pick_unroll(LB), interpret=interpret)
    for k, q in enumerate(qs):
        if q.size == 0:
            out = out.at[k].set(lb2.astype(jnp.int32))
    return out
