"""Pallas TPU kernel: one-vs-many uniform Levenshtein (Myers/Hyyrö).

The hot loop of the whole framework (SURVEY.md §3.1: the reference's
``hyrroe2003`` inner body, ``levenshtein.rs:466-490``, is the loop the TPU
kernel must hit speed-of-light on).

Design:
* 1024 candidates per grid cell, laid out as an (8 sublane, 128 lane) tile;
  every VPU element-op advances 1024 pairs by one step.
* The candidate corpus is pre-arranged ``[LB, B/128, 128]`` so step ``j``
  reads a contiguous ``[8, 128]`` tile of the j-th char of each candidate.
* The query's PM bitvector table (the reference's ``PatternMatchVector``,
  ``pattern_match_vector.rs:67-155``) lives in VMEM as 128-entry lane
  tables and is looked up with ``tpu.dynamic_gather``
  (``jnp.take_along_axis`` on the lane axis) — O(1) ops per char instead
  of a 64-compare PM reconstruction:
    - mode "byte":  chars < 256; two 128-entry tables + select
    - mode "local": chars already remapped to query-local ids < 128
      (host/XLA prepass; a 64-char query has <= 65 distinct ids)
* u64 words of the reference become W = ceil(LA/32) u32 words with the
  HP/HN carry chain of the block recurrence (``levenshtein.rs:838-875``).
* Query length is static per compilation (one-vs-many amortizes it), so
  the D[m, j] bit test is a constant mask on a fixed word.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
TILE = SUB * LANE  # candidates per grid cell


def build_pm_tables(query: np.ndarray, mode: str) -> np.ndarray:
    """Host-side PM table build (amortized per query, like
    ``BatchComparator::new`` at ``levenshtein.rs:1645-1657``).

    Returns [T, SUB, LANE] u32 where T = ntables * W and entry
    ``[t, :, c]`` is PM word ``t % W``? -- layout: tables are ordered
    word-major: for word w, table slot (w * ntables + h) covers chars
    ``[h*128, (h+1)*128)`` ("byte" has ntables=2, "local" 1).
    """
    q = np.asarray(query, np.int64)
    la = q.size
    W = max(1, -(-int(la) // 32))
    if mode == "byte":
        ntab, dom = 2, 256
    elif mode == "local":
        ntab, dom = 1, 128
    else:
        raise ValueError(mode)
    pm = np.zeros((dom, W), np.uint32)
    for i, ch in enumerate(q):
        if 0 <= ch < dom:
            pm[int(ch), i // 32] |= np.uint32(1 << (i % 32))
    tabs = np.zeros((W * ntab, SUB, LANE), np.uint32)
    for w in range(W):
        for h in range(ntab):
            tabs[w * ntab + h, :, :] = pm[h * LANE:(h + 1) * LANE, w]
    return tabs


def _kernel(tab_ref, cand_ref, lb_ref, out_ref, *, la: int, LB: int, W: int,
            ntab: int):
    lb = lb_ref[:, :]
    last_word = (la - 1) // 32
    last_mask = jnp.uint32(1 << ((la - 1) % 32))
    ones = jnp.full((SUB, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros = jnp.zeros((SUB, LANE), jnp.uint32)

    def body(j, state):
        dist, *vpvn = state
        vp = vpvn[:W]
        vn = vpvn[W:]
        c = cand_ref[j]
        active = j < lb
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None

        hp_c = jnp.ones((SUB, LANE), jnp.uint32)
        hn_c = jnp.zeros((SUB, LANE), jnp.uint32)
        new_vp = list(vp)
        new_vn = list(vn)
        delta = None
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pmw = jnp.where(chi, t1, t0)
            else:
                pmw = t0
            x = pmw | hn_c
            vpw = vp[w]
            vnw = vn[w]
            d0 = (((x & vpw) + vpw) ^ vpw) | x | vnw
            hp = vnw | ~(d0 | vpw)
            hn = d0 & vpw
            if w == last_word:
                delta = (jnp.where(hp & last_mask != 0, 1, 0)
                         - jnp.where(hn & last_mask != 0, 1, 0))
            hp_out = hp >> 31
            hn_out = hn >> 31
            hp_s = (hp << 1) | hp_c
            hn_s = (hn << 1) | hn_c
            new_vp[w] = hn_s | ~(d0 | hp_s)
            new_vn[w] = hp_s & d0
            hp_c, hn_c = hp_out, hn_out

        dist = jnp.where(active, dist + delta, dist)
        sel = active
        for w in range(W):
            new_vp[w] = jnp.where(sel, new_vp[w], vp[w])
            new_vn[w] = jnp.where(sel, new_vn[w], vn[w])
        return (dist, *new_vp, *new_vn)

    dist0 = jnp.full((SUB, LANE), la, jnp.int32)
    state = (dist0,) + (ones,) * W + (zeros,) * W
    state = jax.lax.fori_loop(0, LB, body, state)
    out_ref[:, :] = state[0]


@functools.partial(jax.jit,
                   static_argnames=("la", "LB", "W", "ntab", "interpret"))
def _run(tabs, cand3, lb2, *, la, LB, W, ntab, interpret=False):
    nblocks = cand3.shape[1] // SUB
    kern = functools.partial(_kernel, la=la, LB=LB, W=W, ntab=ntab)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((W * ntab, SUB, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        interpret=interpret,
    )(tabs, cand3, lb2)


@functools.partial(jax.jit, static_argnames=("LB",))
def prepare_corpus(chars: jnp.ndarray, lens: jnp.ndarray, *, LB: int):
    """[B, LB] i32 -> ([LB, B/128, 128], [B/128, 128]) device layout."""
    B = chars.shape[0]
    cand3 = jnp.transpose(chars, (1, 0)).reshape(LB, B // LANE, LANE)
    lb2 = lens.reshape(B // LANE, LANE)
    return cand3, lb2


def lev_1v_many(query: np.ndarray, cand3, lb2, *, mode: str = "byte",
                interpret: bool = False) -> jnp.ndarray:
    """One-vs-many uniform Levenshtein distances -> [B/128, 128] i32.

    ``cand3``/``lb2`` from :func:`prepare_corpus`; candidate count must be
    a multiple of 1024 (host pads; padded rows have length 0 and yield
    ``la`` which callers slice away).
    """
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        return jnp.broadcast_to(lb2, lb2.shape).astype(jnp.int32)
    LB = int(cand3.shape[0])
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    tabs = build_pm_tables(q, mode)
    return _run(jnp.asarray(tabs), cand3, lb2, la=la, LB=LB, W=W, ntab=ntab,
                interpret=interpret)
