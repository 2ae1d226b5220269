"""Pallas TPU kernel: one-vs-many Levenshtein over LONG candidates.

The fixed-bucket kernel (:mod:`lev_kernel`) holds a candidate block of
``LB * 4096`` bytes in VMEM, capping buckets at ~1024 chars.  The
reference handles arbitrarily long texts in its core block kernel
(``/root/reference/src/distance/levenshtein.rs:769-1019`` — the 106k-char
OCR pair is its proof fixture); this kernel restores that capability on
TPU by streaming the text as a second grid dimension:

* grid ``(candidate_blocks, text_chunks)`` — the chunk axis iterates
  sequentially (TPU grids execute in order, last dimension fastest), so
  the Myers state (dist, VP, VN) carries across chunks of the same
  candidate block in VMEM scratch, initialized at chunk 0 and emitted to
  the output block after the last chunk (SURVEY.md §5 long-context plan:
  "a sequential scan over text chunks with carried (VP, VN) state").
* each chunk block is ``CH * 4096`` bytes (CH = 512 -> 2 MB double
  buffered), independent of the total bucket length, so buckets of any
  length fit VMEM.
* inside a chunk the body is the :mod:`lev_kernel` hot loop verbatim
  (same PM tables, packed rows, dynamic trip counts); chunks wholly past
  the tile's longest candidate run zero trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lev_kernel import (LANE, SUB, build_pm_tables, pick_mode, pick_unroll,
                         unpack_byte)

CHUNK = 512          # text chars per grid step (CH/4 * 32 * 128 u32 = 2 MB)


def _kernel(la_ref, tab_ref, cand_ref, lb_ref, out_ref,
            dist_ref, vp_ref, vn_ref, *, CH: int, W: int, ntab: int,
            unroll: int, sub: int, nchunks: int):
    j = pl.program_id(1)
    la = la_ref[0]
    lb = lb_ref[:, :]
    last_bit = ((la - 1) & 31).astype(jnp.uint32)

    @pl.when(j == 0)
    def _init():
        dist_ref[:, :] = jnp.broadcast_to(la, (sub, LANE)).astype(jnp.int32)
        vp_ref[:, :, :] = jnp.full((W, sub, LANE), 0xFFFFFFFF, jnp.uint32)
        vn_ref[:, :, :] = jnp.zeros((W, sub, LANE), jnp.uint32)

    base = j * CH

    def one_char(row, u, jg, dist, vp, vn):
        c = unpack_byte(row, u)
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None
        hp_c = jnp.ones((sub, LANE), jnp.uint32)
        hn_c = jnp.zeros((sub, LANE), jnp.uint32)
        nvp, nvn = list(vp), list(vn)
        delta = None
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pmw = jnp.where(chi, t1, t0)
            else:
                pmw = t0
            x = pmw | hn_c
            vpw, vnw = vp[w], vn[w]
            d0 = (((x & vpw) + vpw) ^ vpw) | x | vnw
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
            hp_c, hn_c = hp_out, hn_out
        dist = jnp.where(jg < lb, dist + delta, dist)
        return dist, nvp, nvn

    def body(jj, state):
        dist, *rest = state
        vp = list(rest[:W])
        vn = list(rest[W:])
        row = None
        for u in range(unroll):
            if u % 4 == 0:
                row = cand_ref[jj * (unroll // 4) + u // 4]
            dist, vp, vn = one_char(row, u, base + jj * unroll + u,
                                    dist, vp, vn)
        return (dist, *vp, *vn)

    dist = dist_ref[:, :]
    vp = [vp_ref[w] for w in range(W)]
    vn = [vn_ref[w] for w in range(W)]
    # trips clamped to this chunk; chunks past the tile's longest
    # candidate run zero iterations (length-sorted corpora stop early)
    rem = jnp.max(lb) - base
    trips = jnp.clip((rem + (unroll - 1)) // unroll, 0, CH // unroll)
    state = jax.lax.fori_loop(0, trips, body, (dist, *vp, *vn))
    dist_ref[:, :] = state[0]
    for w in range(W):
        vp_ref[w] = state[1 + w]
        vn_ref[w] = state[1 + W + w]

    @pl.when(j == nchunks - 1)
    def _emit():
        out_ref[:, :] = dist_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _run(la, tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
         interpret=False):
    assert LB % CHUNK == 0, (LB, CHUNK)
    nblocks = cand3.shape[1] // sub
    assert nblocks * sub == cand3.shape[1] and nblocks > 0, \
        (cand3.shape, sub)
    nchunks = LB // CHUNK
    kern = functools.partial(_kernel, CH=CHUNK, W=W, ntab=ntab,
                             unroll=unroll, sub=sub, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nblocks, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * ntab, sub, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK // 4, sub, LANE), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(la, tabs, cand3, lb2)


def lev_stream_1v_many(query: np.ndarray, cand3, lb2, *, mode: str = "byte",
                       staged=None, interpret: bool = False) -> jnp.ndarray:
    """One-vs-many uniform Levenshtein for long candidate buckets.

    Same contract as :func:`lev_kernel.lev_1v_many`, but ``cand3`` may
    come from a bucket of any CHUNK-multiple length (4096, 16384, ...).
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
    return _run(la_arr, tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                unroll=pick_unroll(LB), interpret=interpret)


# ---------------------------------------------------- LCS (indel) stream

def _lcs_kernel(tab_ref, cand_ref, lb_ref, out_ref, s_ref, *, CH: int,
                W: int, ntab: int, unroll: int, sub: int, nchunks: int):
    """LCS over streamed text chunks: the :mod:`lcs_kernel` recurrence
    (``lcs_seq.rs:225-235``) with the Hyyrö s-state carried in VMEM
    scratch across chunks; serves lcs_seq/indel/fuzz.ratio on long
    candidate buckets."""
    j = pl.program_id(1)
    lb = lb_ref[:, :]

    @pl.when(j == 0)
    def _init():
        s_ref[:, :, :] = jnp.full((W, sub, LANE), 0xFFFFFFFF, jnp.uint32)

    base = j * CH

    def one_char(row, u, jg, s, masked):
        c = unpack_byte(row, u)
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None
        carry = None
        new_s = []
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pmw = jnp.where(chi, t1, t0)
            else:
                pmw = t0
            sw = s[w]
            um = sw & pmw
            x1 = sw + um
            x2 = x1 if carry is None else x1 + carry
            if w != W - 1:
                c1 = (x1 < sw).astype(jnp.uint32)
                carry = c1 if carry is None else c1 | (x2 < x1).astype(
                    jnp.uint32)
            new_s.append(x2 | (sw - um))
        if masked:
            active = jg < lb
            new_s = [jnp.where(active, ns, sw)
                     for ns, sw in zip(new_s, s)]
        return new_s

    def make_body(masked):
        def body(jj, state):
            s = list(state)
            row = None
            for u in range(unroll):
                if u % 4 == 0:
                    row = cand_ref[jj * (unroll // 4) + u // 4]
                s = one_char(row, u, base + jj * unroll + u, s, masked)
            return tuple(s)
        return body

    s = tuple(s_ref[w] for w in range(W))
    full_trips = jnp.clip(jnp.min(lb) - base, 0, CH) // unroll
    rem = jnp.max(lb) - base
    trips = jnp.clip((rem + (unroll - 1)) // unroll, 0, CH // unroll)
    s = jax.lax.fori_loop(0, full_trips, make_body(False), s)
    s = jax.lax.fori_loop(full_trips, trips, make_body(True), s)
    for w in range(W):
        s_ref[w] = s[w]

    @pl.when(j == nchunks - 1)
    def _emit():
        sim = jnp.zeros((sub, LANE), jnp.int32)
        for w in range(W):
            sim = sim + jax.lax.population_count(~s_ref[w]).astype(
                jnp.int32)
        out_ref[:, :] = sim


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _lcs_run(tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
             interpret=False):
    assert LB % CHUNK == 0, (LB, CHUNK)
    nblocks = cand3.shape[1] // sub
    assert nblocks * sub == cand3.shape[1] and nblocks > 0, \
        (cand3.shape, sub)
    nchunks = LB // CHUNK
    kern = functools.partial(_lcs_kernel, CH=CHUNK, W=W, ntab=ntab,
                             unroll=unroll, sub=sub, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nblocks, nchunks),
        in_specs=[
            pl.BlockSpec((W * ntab, sub, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK // 4, sub, LANE), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((W, SUB, LANE), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tabs, cand3, lb2)


def lcs_stream_1v_many(query: np.ndarray, cand3, lb2, *,
                       mode: str = "byte", staged=None,
                       interpret: bool = False) -> jnp.ndarray:
    """One-vs-many LCS lengths for long candidate buckets."""
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        return jnp.zeros(lb2.shape, jnp.int32)
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    tabs = (staged[1] if staged is not None
            else jnp.asarray(build_pm_tables(q, mode)))
    return _lcs_run(tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                    unroll=pick_unroll(LB), interpret=interpret)


# ------------------------------------------------------------- OSA stream

def _osa_kernel(la_ref, tab_ref, cand_ref, lb_ref, out_ref,
                dist_ref, vp_ref, vn_ref, d0_ref, pm_ref, *, CH: int,
                W: int, ntab: int, unroll: int, sub: int, nchunks: int):
    """OSA over streamed text chunks: the :mod:`osa_kernel` recurrence
    (``osa.rs:156-227``) with the transposition history (previous step's
    d0 and pm per word) carried in VMEM scratch alongside the Myers
    state; restores long-candidate OSA on TPU (the reference's
    multi-word block kernel handles any length)."""
    j = pl.program_id(1)
    la = la_ref[0]
    lb = lb_ref[:, :]
    last_bit = ((la - 1) & 31).astype(jnp.uint32)

    @pl.when(j == 0)
    def _init():
        dist_ref[:, :] = jnp.broadcast_to(la, (sub, LANE)).astype(jnp.int32)
        vp_ref[:, :, :] = jnp.full((W, sub, LANE), 0xFFFFFFFF, jnp.uint32)
        vn_ref[:, :, :] = jnp.zeros((W, sub, LANE), jnp.uint32)
        d0_ref[:, :, :] = jnp.zeros((W, sub, LANE), jnp.uint32)
        pm_ref[:, :, :] = jnp.zeros((W, sub, LANE), jnp.uint32)

    base = j * CH

    def one_char(row, u, jg, dist, vp, vn, d0p, pmp):
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
        dist = jnp.where(jg < lb, dist + delta, dist)
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
            dist, vp, vn, d0p, pmp = one_char(row, u, base + jj * unroll + u,
                                              dist, vp, vn, d0p, pmp)
        return (dist, *vp, *vn, *d0p, *pmp)

    state = (dist_ref[:, :],) \
        + tuple(vp_ref[w] for w in range(W)) \
        + tuple(vn_ref[w] for w in range(W)) \
        + tuple(d0_ref[w] for w in range(W)) \
        + tuple(pm_ref[w] for w in range(W))
    rem = jnp.max(lb) - base
    trips = jnp.clip((rem + (unroll - 1)) // unroll, 0, CH // unroll)
    state = jax.lax.fori_loop(0, trips, body, state)
    dist_ref[:, :] = state[0]
    for w in range(W):
        vp_ref[w] = state[1 + w]
        vn_ref[w] = state[1 + W + w]
        d0_ref[w] = state[1 + 2 * W + w]
        pm_ref[w] = state[1 + 3 * W + w]

    @pl.when(j == nchunks - 1)
    def _emit():
        out_ref[:, :] = dist_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _osa_run(la, tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
             interpret=False):
    assert LB % CHUNK == 0, (LB, CHUNK)
    nblocks = cand3.shape[1] // sub
    assert nblocks * sub == cand3.shape[1] and nblocks > 0, \
        (cand3.shape, sub)
    nchunks = LB // CHUNK
    kern = functools.partial(_osa_kernel, CH=CHUNK, W=W, ntab=ntab,
                             unroll=unroll, sub=sub, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nblocks, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * ntab, sub, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK // 4, sub, LANE), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(la, tabs, cand3, lb2)


def osa_stream_1v_many(query: np.ndarray, cand3, lb2, *, mode: str = "byte",
                       staged=None, interpret: bool = False) -> jnp.ndarray:
    """One-vs-many OSA distances for long candidate buckets."""
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        return jnp.broadcast_to(lb2, lb2.shape).astype(jnp.int32)
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    la_arr, tabs = staged if staged is not None else (
        jnp.array([la], jnp.int32), jnp.asarray(build_pm_tables(q, mode)))
    return _osa_run(la_arr, tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                    unroll=pick_unroll(LB), interpret=interpret)


# ------------------------------------------------------------ Jaro stream

def _jaro_kernel(la_ref, tab_ref, cand_ref, lb_ref, common_ref,
                 trans_ref, pref_ref, wm_ref, pf_ref, tf_ref, rem_ref,
                 tc_ref, *, CH: int, W: int, TW: int, ntab: int, sub: int,
                 nchunks: int):
    """Jaro components over streamed text chunks.

    The chunk grid axis is DOUBLED: steps ``[0, nchunks)`` run the greedy
    flag pass (``jaro.rs:147-190`` semantics, window mask shifted
    incrementally, claims into ``pf``/``tf`` scratch), steps
    ``[nchunks, 2*nchunks)`` replay the text against the final claimed
    set counting transpositions (``jaro.rs:339-368``).  Unlike
    :mod:`jaro_kernel` (fully unrolled, static flag-word indices), text
    flags live in a ``(ceil(LB/32), sub, LANE)`` scratch ref indexed
    dynamically, and the common-prefix test compares against the query
    chars in SMEM instead of a PM-word probe — so the loop body is a
    ``fori_loop`` and LB is bounded only by the flag scratch (~LB/32
    words), not by flat-body compile time.
    """
    jg = pl.program_id(1)
    phase2 = jg >= nchunks
    la = la_ref[0]
    lb = lb_ref[:, :]
    zeros = jnp.zeros((sub, LANE), jnp.uint32)

    longer = jnp.maximum(la, lb)
    bound = jnp.maximum(longer // 2 - 1, 0)
    len1 = jnp.minimum(la, lb + bound)
    len2 = jnp.minimum(lb, la + bound)
    lenmask = [_mask_below_lane(len1 - 32 * w) for w in range(W)]

    @pl.when(jg == 0)
    def _init():
        pref_ref[:, :] = jnp.zeros((sub, LANE), jnp.int32)
        wm_ref[:, :, :] = jnp.zeros((W, sub, LANE), jnp.uint32)
        pf_ref[:, :, :] = jnp.zeros((W, sub, LANE), jnp.uint32)
        tf_ref[:, :, :] = jnp.zeros((TW, sub, LANE), jnp.uint32)

    @pl.when(jg == nchunks)
    def _init2():
        for w in range(W):
            rem_ref[w] = pf_ref[w]
        tc_ref[:, :] = jnp.zeros((sub, LANE), jnp.int32)

    base = (jg - jnp.where(phase2, nchunks, 0)) * CH

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
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo,
                                         axis=1)
                pm.append(jnp.where(chi, t1, t0))
            else:
                pm.append(t0)
        return pm

    def flag_char(row, u, j, pref, wmask, pflag):
        c = unpack_byte(row, u)
        pm = gather_pm(c)

        # initial window [0, bound] at j == 0, else slide both ends up
        init = [(_mask_below_lane(bound + 1 - 32 * w)) for w in range(W)]
        nw = []
        c_in = zeros
        for w in range(W):
            shifted = (wmask[w] << 1) | c_in
            c_in = wmask[w] >> 31
            nw.append(shifted)
        # while j <= bound the lower end is clamped at pattern position 0
        keep_low = jnp.where(j <= bound, jnp.uint32(1), jnp.uint32(0))
        nw[0] = nw[0] | keep_low
        is0 = j == 0
        wmask = [jnp.where(is0, iw, sw) & lenmask[w]
                 for w, (iw, sw) in enumerate(zip(init, nw))]

        # prefix step: compare with the query char directly (SMEM;
        # la_ref[0] is la, la_ref[1 + k] is query char k, padded -3)
        qc = la_ref[1 + jnp.minimum(j, jnp.int32(W * 32 - 1))]
        in_pref = ((pref == j) & (c == qc) & (j < len1) & (j < len2)
                   & (j < la))
        pref = pref + in_pref.astype(jnp.int32)
        jw = j // 32
        jbit = jnp.uint32(1) << (j % 32).astype(jnp.uint32)
        npflag = list(pflag)
        for w in range(W):
            npflag[w] = npflag[w] | jnp.where(in_pref & (jw == w), jbit,
                                              jnp.uint32(0))

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

        flagged = hit | in_pref
        tf_ref[jw] = tf_ref[jw] | jnp.where(flagged, jbit, jnp.uint32(0))
        return pref, wmask, npflag

    def trans_char(row, u, j, rem, t):
        actb = (tf_ref[j // 32]
                & (jnp.uint32(1) << (j % 32).astype(jnp.uint32))) != 0
        pm = gather_pm(unpack_byte(row, u))
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

    def body1(jj, state):
        pref, *rest = state
        wmask = list(rest[:W])
        pflag = list(rest[W:])
        row = cand_ref[jj]
        for u in range(4):
            pref, wmask, pflag = flag_char(row, u, base + jj * 4 + u,
                                           pref, wmask, pflag)
        return (pref, *wmask, *pflag)

    def body2(jj, state):
        t, *rem = state
        rem = list(rem)
        row = cand_ref[jj]
        for u in range(4):
            rem, t = trans_char(row, u, base + jj * 4 + u, rem, t)
        return (t, *rem)

    # text truncates at len2 <= (la + lb)/2-ish; beyond it nothing flags
    rem_steps = jnp.max(jnp.minimum(lb, len2)) - base
    trips = jnp.clip((rem_steps + 3) // 4, 0, CH // 4)

    @pl.when(~phase2)
    def _pass1():
        state = (pref_ref[:, :],) \
            + tuple(wm_ref[w] for w in range(W)) \
            + tuple(pf_ref[w] for w in range(W))
        state = jax.lax.fori_loop(0, trips, body1, state)
        pref_ref[:, :] = state[0]
        for w in range(W):
            wm_ref[w] = state[1 + w]
            pf_ref[w] = state[1 + W + w]

    @pl.when(phase2)
    def _pass2():
        state = (tc_ref[:, :],) + tuple(rem_ref[w] for w in range(W))
        state = jax.lax.fori_loop(0, trips, body2, state)
        tc_ref[:, :] = state[0]
        for w in range(W):
            rem_ref[w] = state[1 + w]

    @pl.when(jg == 2 * nchunks - 1)
    def _emit():
        common = jnp.zeros((sub, LANE), jnp.int32)
        for w in range(W):
            common = common + jax.lax.population_count(
                pf_ref[w]).astype(jnp.int32)
        common_ref[:, :] = common
        trans_ref[:, :] = tc_ref[:, :]


def _mask_below_lane(n):
    """Bits 0..n-1 set for per-lane n in [0, 32]; negative n -> 0."""
    nc = jnp.clip(n, 0, 31).astype(jnp.uint32)
    m = (np.uint32(1) << nc) - np.uint32(1)
    m = jnp.where(n >= 32, np.uint32(0xFFFFFFFF), m)
    return jnp.where(n <= 0, np.uint32(0), m)


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "sub", "interpret"))
def _jaro_run(scal, tabs, cand3, lb2, *, LB, W, ntab, sub=SUB,
              interpret=False):
    """``scal`` is ``[la, q_0..q_{W*32-1}]`` int32 (SMEM) — one array so
    the signature matches the sharded 4-arg runner convention."""
    assert LB % CHUNK == 0, (LB, CHUNK)
    nblocks = cand3.shape[1] // sub
    assert nblocks * sub == cand3.shape[1] and nblocks > 0, \
        (cand3.shape, sub)
    nchunks = LB // CHUNK
    TW = -(-LB // 32)
    kern = functools.partial(_jaro_kernel, CH=CHUNK, W=W, TW=TW,
                             ntab=ntab, sub=sub, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nblocks, 2 * nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * ntab, sub, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK // 4, sub, LANE),
                         lambda i, j: (j % nchunks, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
            jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.int32),          # pref
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),      # window mask
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),      # pattern flags
            pltpu.VMEM((TW, SUB, LANE), jnp.uint32),     # text flags
            pltpu.VMEM((W, SUB, LANE), jnp.uint32),      # pass-2 remaining
            pltpu.VMEM((SUB, LANE), jnp.int32),          # transpositions
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scal, tabs, cand3, lb2)


#: flag-scratch budget: TW * sub * LANE * 4 bytes (~2 MB at LB=4096,
#: ~4 MB at 8192, ~8 MB at 16384).  16384 compiles and is oracle-exact
#: on v5e for moderate queries (evidence/jaro_stream_cap_probe_r5b.log:
#: 10240/12288/16384 all ok at W=4); what does NOT fit is a LONG QUERY
#: on a long bucket — the three W-word query scratches add
#: 3*W*32*128*4 B, and a 9000-char query (W=282, ~13.8 MB) crashed the
#: remote compiler (evidence/hw_conformance_r5_jaro16k_stdout.log).
#: jaro_stream_query_fits gates that dimension; oversize queries take
#: the scanner's XLA fallback with a RuntimeWarning.
JARO_STREAM_MAX_LB = 16384


def jaro_stream_query_fits(la: int, LB: int) -> bool:
    """True when the (query W-word + text-flag + chunk) scratch set
    fits the proven VMEM budget.  13 MB keeps us just above the
    largest configuration proven good on hardware (~12.4 MB at
    LB=16384/W=4) and far below the proven-bad ~25.8 MB."""
    W = max(1, -(-la // 32))
    TW = -(-LB // 32)
    slice_b = SUB * LANE * 4
    used = ((3 * W + TW) + 2 * W) * slice_b \
        + 2 * (CHUNK // 4) * slice_b
    return used <= 13 * 1024 * 1024


def jaro_stream_1v_many(query: np.ndarray, cand3, lb2, *,
                        mode: str = "byte", staged=None,
                        interpret: bool = False):
    """One-vs-many Jaro (common, transpositions) for long candidate
    buckets (up to ``JARO_STREAM_MAX_LB`` chars)."""
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        z = jnp.zeros(lb2.shape, jnp.int32)
        return z, z
    LB = int(cand3.shape[0]) * 4
    if LB > JARO_STREAM_MAX_LB:
        raise ValueError(f"jaro stream bucket cap {JARO_STREAM_MAX_LB}")
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    scal = np.full(1 + W * 32, -3, np.int32)  # pad: never matches
    scal[0] = la
    scal[1:1 + la] = q.astype(np.int32)
    tabs = (staged[1] if staged is not None
            else jnp.asarray(build_pm_tables(q, mode)))
    return _jaro_run(jnp.asarray(scal), tabs, cand3, lb2,
                     LB=LB, W=W, ntab=ntab, interpret=interpret)


# ------------------------------------------------- weighted Lev stream

def _wlev_kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref, row_ref,
                 *, CH: int, LA: int, W: int, ntab: int, sub: int,
                 nchunks: int):
    """Weighted Wagner-Fischer over streamed text chunks: the DP row
    (``LA + 1`` tiles, :mod:`wlev_kernel` layout) carried in VMEM scratch
    across chunk grid steps — weighted scans on long candidate buckets
    stay on device."""
    jg = pl.program_id(1)
    la = scal_ref[0]
    ins = scal_ref[1]
    dele = scal_ref[2]
    subc = scal_ref[3]
    lb = lb_ref[:, :]
    BIG = jnp.int32(1 << 29)

    pidx = [jnp.full((sub, LANE), p, jnp.int32) for p in range(LA + 1)]

    @pl.when(jg == 0)
    def _init():
        for p in range(LA + 1):
            row_ref[p] = jnp.where(pidx[p] <= la, pidx[p] * dele, BIG)

    base = jg * CH

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
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo,
                                         axis=1)
                pm.append(jnp.where(chi, t1, t0))
            else:
                pm.append(t0)

        active = (base + j) < lb
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

    row = tuple(row_ref[p] for p in range(LA + 1))
    rem = jnp.max(lb) - base
    trips = jnp.clip(rem, 0, CH)
    row = jax.lax.fori_loop(0, trips, body, row)
    for p in range(LA + 1):
        row_ref[p] = row[p]

    @pl.when(jg == nchunks - 1)
    def _emit():
        out = jnp.full((sub, LANE), BIG, jnp.int32)
        for p in range(LA + 1):
            out = jnp.where(pidx[p] == la, row_ref[p], out)
        out_ref[:, :] = out


#: row-scratch budget (LA+1, sub, LANE) i32 -> ~4 MB at LA=256
WLEV_STREAM_MAX_LA = 256


@functools.partial(jax.jit,
                   static_argnames=("LA", "LB", "W", "ntab", "sub",
                                    "interpret"))
def _wlev_run(scal, tabs, cand3, lb2, *, LA, LB, W, ntab, sub=SUB,
              interpret=False):
    assert LB % CHUNK == 0, (LB, CHUNK)
    nblocks = cand3.shape[1] // sub
    assert nblocks * sub == cand3.shape[1] and nblocks > 0, \
        (cand3.shape, sub)
    nchunks = LB // CHUNK
    kern = functools.partial(_wlev_kernel, CH=CHUNK, LA=LA, W=W,
                             ntab=ntab, sub=sub, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nblocks, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * ntab, sub, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK // 4, sub, LANE), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LA + 1, SUB, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scal, tabs, cand3, lb2)


def wlev_stream_1v_many(query: np.ndarray, cand3, lb2, *, ins: int,
                        dele: int, sub_cost: int, mode: str = "byte",
                        interpret: bool = False) -> jnp.ndarray:
    """One-vs-many weighted Levenshtein for long candidate buckets
    (pattern up to ``WLEV_STREAM_MAX_LA`` chars)."""
    q = np.asarray(query)
    la = int(q.size)
    LB = int(cand3.shape[0]) * 4
    if la * max(dele, sub_cost, 1) + LB * max(ins, sub_cost, 1) >= 2 ** 31:
        raise ValueError("weight table too large for the int32 device DP")
    if la == 0:
        return (jnp.broadcast_to(lb2, lb2.shape)
                * np.int32(ins)).astype(jnp.int32)
    W = max(1, -(-la // 32))
    LA = W * 32
    if LA > WLEV_STREAM_MAX_LA:
        raise ValueError(f"wlev stream pattern cap {WLEV_STREAM_MAX_LA}")
    ntab = 2 if mode == "byte" else 1
    tabs = build_pm_tables(q, mode)
    scal = jnp.array([la, ins, dele, sub_cost], jnp.int32)
    return _wlev_run(scal, jnp.asarray(tabs), cand3, lb2, LA=LA, LB=LB,
                     W=W, ntab=ntab, interpret=interpret)
