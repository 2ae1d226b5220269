"""Pallas TPU kernel: one-vs-many Jaro components (common, transpositions).

Reproduces the reference's exact match-assignment semantics
(``/root/reference/src/distance/jaro.rs:422-514``) with the same
tiling/table design as :mod:`lev_kernel`:

* window ``bound = max(la, lb)/2 - 1`` (clamped at 0), pattern truncated to
  ``len1 = min(la, lb + bound)``, text to ``len2 = min(lb, la + bound)``
  (``jaro.rs:457-470``);
* greedy flagging (``jaro.rs:147-190``): per text char, claim the *lowest
  unflagged* matching pattern bit inside the moving window.  The window
  bitmask is maintained **incrementally** — ``[j+1-bound, j+1+bound]`` is
  exactly ``[j-bound, j+bound] << 1`` — so each step is a cross-word shift
  plus a top clamp, not a mask rebuild;
* the common prefix (counted without transpositions, ``jaro.rs:475-479``)
  is folded into the claimed masks: prefix positions are pre-claimed in
  both ``pflag`` and ``tflag``.  Rank-matching then pairs prefix text char
  ``j`` with prefix pattern char ``j`` (equal by construction, zero
  mismatch contribution), so ``common = popcount(pflag)`` and the
  transposition count are unchanged — while the flag window automatically
  excludes prefix positions via ``~pflag``;
* transpositions (``jaro.rs:339-368``): second text pass pops the lowest
  remaining claimed pattern bit per flagged text char (text order vs
  pattern order) and counts mismatches.  The char comparison is a PM bit
  test — ``P[pos] == c  iff  PM[c] & lowest_bit != 0`` — so no pattern
  chars are materialised.

Outputs integer ``(common, transpositions)``; the f64 similarity
(``jaro.rs:106-119``) and the Winkler boost are evaluated host-side in
exact double precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lev_kernel import LANE, SUB, build_pm_tables, unpack_byte

FULL = np.uint32(0xFFFFFFFF)


def _mask_below(n):
    """Bits 0..n-1 set, for per-lane n in [0, 32]; negative n -> 0."""
    nc = jnp.clip(n, 0, 31).astype(jnp.uint32)
    m = (np.uint32(1) << nc) - np.uint32(1)
    m = jnp.where(n >= 32, FULL, m)
    return jnp.where(n <= 0, np.uint32(0), m)


def _kernel(la_ref, tab_ref, cand_ref, lb_ref, common_ref, trans_ref, *,
            LB: int, W: int, ntab: int, sub: int, multiq: bool = False):
    la = la_ref[pl.program_id(1)] if multiq else la_ref[0]
    lb = lb_ref[:, :]
    zeros = jnp.zeros((sub, LANE), jnp.uint32)

    longer = jnp.maximum(la, lb)
    bound = jnp.maximum(longer // 2 - 1, 0)
    len1 = jnp.minimum(la, lb + bound)          # truncated pattern length
    len2 = jnp.minimum(lb, la + bound)          # truncated text length

    # static per-candidate masks: pattern bits < len1, per word
    lenmask = [_mask_below(len1 - 32 * w) for w in range(W)]

    def gather_pm(c):
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
        return pm

    TW = max(1, -(-LB // 32))   # text-flag words

    # ---------------------------------------------------------- pass 1: flag
    def flag_char(j, pref, wmask, pflag, tflag):
        pm = gather_pm(unpack_byte(cand_ref[j // 4], j))

        # window slides up by one: both ends of [j-bound, j+bound] move
        if j == 0:
            # initial window [0, bound]
            nw = [_mask_below(bound + 1 - 32 * w) & lenmask[w]
                  for w in range(W)]
        else:
            nw = []
            c_in = zeros
            for w in range(W):
                shifted = (wmask[w] << 1) | c_in
                c_in = wmask[w] >> 31
                nw.append(shifted & lenmask[w])
            # while j <= bound the window's lower end is clamped at pattern
            # position 0, which a pure shift would drop
            nw[0] = nw[0] | (jnp.where(j <= bound, jnp.uint32(1),
                                       jnp.uint32(0)) & lenmask[0])
        wmask = nw

        # prefix step: while pref == j and chars equal, claim position j in
        # both masks (counts toward common, zero transposition contribution);
        # pattern position j only exists while j < W*32
        npflag = list(pflag)
        if j // 32 < W:
            eqbit = (pm[j // 32] >> jnp.uint32(j % 32)) & 1
            in_pref = ((pref == j) & (eqbit != 0)
                       & (j < len1) & (j < len2))
            pref = pref + in_pref.astype(jnp.int32)
            npflag[j // 32] = npflag[j // 32] | jnp.where(
                in_pref, jnp.uint32(1 << (j % 32)), jnp.uint32(0))
        else:
            in_pref = jnp.zeros((sub, LANE), bool)

        # greedy claim of the lowest available pattern bit in the window
        avail = [pm[w] & wmask[w] & ~npflag[w] for w in range(W)]
        act = (pref <= j) & (j < len2)
        found = None
        low = []
        for w in range(W):
            lw = avail[w] & (jnp.uint32(0) - avail[w])
            nz = avail[w] != 0
            if found is None:
                low.append(lw)
                found = nz
            else:
                low.append(jnp.where(found, jnp.uint32(0), lw))
                found = found | nz
        hit = found & act
        for w in range(W):
            npflag[w] = npflag[w] | jnp.where(hit, low[w], jnp.uint32(0))

        ntflag = list(tflag)
        ntflag[j // 32] = ntflag[j // 32] | jnp.where(
            hit | in_pref, jnp.uint32(1 << (j % 32)), jnp.uint32(0))
        return pref, wmask, npflag, ntflag

    # j must be a python int (static pflag/tflag word indices and shift
    # amounts), so both text passes are fully unrolled
    pref = jnp.zeros((sub, LANE), jnp.int32)
    wmask = [zeros] * W
    pflag = [zeros] * W
    tflag = [zeros] * TW
    for j in range(LB):
        pref, wmask, pflag, tflag = flag_char(j, pref, wmask, pflag, tflag)

    common = jnp.zeros((sub, LANE), jnp.int32)
    for w in range(W):
        common = common + jax.lax.population_count(pflag[w]).astype(jnp.int32)

    # -------------------------------------------- pass 2: transpositions
    def trans_char(j, rem, t):
        act = (tflag[j // 32] >> jnp.uint32(j % 32)) & 1
        actb = act != 0
        pm = gather_pm(unpack_byte(cand_ref[j // 4], j))
        found = None
        low = []
        for w in range(W):
            lw = rem[w] & (jnp.uint32(0) - rem[w])
            nz = rem[w] != 0
            if found is None:
                low.append(lw)
                found = nz
            else:
                low.append(jnp.where(found, jnp.uint32(0), lw))
                found = found | nz
        match = zeros != 0
        nrem = list(rem)
        for w in range(W):
            match = match | ((pm[w] & low[w]) != 0)
            nrem[w] = jnp.where(actb, rem[w] & ~low[w], rem[w])
        t = t + (actb & ~match).astype(jnp.int32)
        return nrem, t

    t0 = jnp.zeros((sub, LANE), jnp.int32)
    rem = pflag
    t = t0
    for j in range(LB):
        rem, t = trans_char(j, rem, t)

    if multiq:
        common_ref[0] = common
        trans_ref[0] = t
    else:
        common_ref[:, :] = common
        trans_ref[:, :] = t


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "sub", "interpret"))
def _run(la, tabs, cand3, lb2, *, LB, W, ntab, sub=SUB, interpret=False):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, ntab=ntab, sub=sub)
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
        out_specs=(
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
            jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        ),
        interpret=interpret,
    )(la, tabs, cand3, lb2)


def jaro_1v_many(query: np.ndarray, cand3, lb2, *, mode: str = "byte",
                 sub: int = SUB, staged=None, interpret: bool = False):
    """One-vs-many Jaro (common, transpositions) -> 2x [B/128, 128] i32.

    ``cand3``/``lb2`` from :func:`lev_kernel.prepare_corpus`.  The caller
    turns components into f64 similarities
    (:func:`rapidfuzz_tpu.distance.jaro.sim_from_components`).
    """
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        z = jnp.zeros(lb2.shape, jnp.int32)
        return z, z
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    la_arr, tabs = staged if staged is not None else (
        jnp.array([la], jnp.int32),
        jnp.asarray(build_pm_tables(q, mode, sub)))
    return _run(la_arr, tabs, cand3, lb2,
                LB=LB, W=W, ntab=ntab, sub=sub, interpret=interpret)


# ------------------------------------------------------------ multi-query

@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "sub", "interpret"))
def _run_nq(las, tabs, cand3, lb2, *, LB, W, ntab, sub=SUB,
            interpret=False):
    """NQ queries' Jaro components in one dispatch (query axis innermost
    so consecutive grid steps share each corpus tile fetch)."""
    NQ = las.shape[0]
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, ntab=ntab, sub=sub,
                             multiq=True)
    spec = pl.BlockSpec((1, sub, LANE), lambda i, q: (q, i, 0),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NQ, cand3.shape[1], LANE), jnp.int32)
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
        out_specs=(spec, spec),
        out_shape=(out, out),
        interpret=interpret,
    )(las, tabs, cand3, lb2)


def jaro_nq_many(queries, cand3, lb2, *, mode: str = "byte", staged=None,
                 interpret: bool = False):
    """Many-vs-many Jaro components -> 2x [NQ, B/128, 128] i32.  All
    queries must share one word bucket; empty queries flag nothing (their
    PM tables and length masks are all-zero), matching the la == 0
    convention of :func:`jaro_1v_many`."""
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
    return _run_nq(las, tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                   interpret=interpret)
