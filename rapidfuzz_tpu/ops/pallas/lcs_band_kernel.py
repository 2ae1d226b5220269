"""Pallas TPU kernel: one-vs-many banded LCS/indel under a score cutoff.

The reference maps an indel ``score_cutoff`` to a band of the LCS DP
(``/root/reference/src/distance/indel.rs:80-104`` ->
``lcs_seq.rs:267-341`` blockwise): any alignment with indel cost <= k
keeps every matched pair within ``|i - j| <= k``, so only a diagonal
band of the Hyyro bit-row needs computing.

Device design (sliding band register, sibling of
``band_kernel._fast_kernel``): the ``S`` bit-row lives in a ``32 * bw``
bit register in band coordinates — bit 0 at pattern position
``j - 16*bw`` for text step ``j`` — so the PM window tables are exactly
:func:`band_kernel.build_shifted_tables` (pre-funneled per step on the
host).  Per step:

* ``u = s & pm``; ``s' = (s + u + carry) | (s ^ u)`` — since ``u`` is a
  subset of ``s``, ``s - u == s ^ u`` bitwise, so only the ADD chains
  carries across band words (``lcs_seq.rs:199-261`` recurrence, as in
  ``ops/lcs.py``);
* the register slides down one pattern row: shift right one bit across
  words, a constant 1 entering at the bottom (rows below the band hold
  "no gain yet");
* the bit dropped off the top is frozen — its zero/one state adds to a
  per-lane LCS accumulator (``acc += 1 - (s' & 1)``).

Candidate padding chars never match, so steps past a candidate's length
leave ``S`` unchanged while the register keeps draining — no per-lane
length masking in the loop.  After ``LB`` steps the remaining register
zeros are drained with a popcount (positions >= la hold the all-ones
padding invariant of ``ops/lcs.py``; positions < 0 never flipped).

Out-of-band candidates compute an UNDERestimate of the LCS (the band
restriction can only lose gains), hence an overestimate of indel — the
caller's cutoff mask therefore accepts exactly the true <= cutoff set
and every accepted value is exact (``levenshtein.rs:565-567`` accept /
reject contract, applied to ``indel.rs:62-104`` semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitpack import add_with_carry
from .band_kernel import (FAST_MAX_LB, FLAT_MAX_STEPS, band_words,
                          build_shifted_tables)
from .lev_kernel import LANE, SUB

BIG = np.int32(1 << 29)
MAX_CUTOFF = 47          # 3-word band, like band_kernel.MAX_CUTOFF_FAST


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref, *, LB: int,
            ntab: int, sub: int, bw: int, unroll_all: bool):
    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros_t = jnp.zeros((sub, LANE), jnp.uint32)
    one_t = jnp.full((sub, LANE), 1, jnp.uint32)
    acc0 = jnp.zeros((sub, LANE), jnp.int32)
    s0 = [ones_t] * bw

    def one_step(j, row, u, state):
        acc, s = state
        c = ((row >> jnp.uint32(8 * u))
             & jnp.uint32(0xFF)).astype(jnp.int32)
        if ntab == 2:
            c_lo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            c_lo = c
            chi = None

        x = []
        for k in range(bw):
            t0 = jnp.broadcast_to(tab_ref[(j * ntab) * bw + k],
                                  (sub, LANE))
            g0 = jnp.take_along_axis(t0, c_lo, axis=1)
            if ntab == 2:
                t1 = jnp.broadcast_to(tab_ref[(j * ntab + 1) * bw + k],
                                      (sub, LANE))
                g0 = jnp.where(chi,
                               jnp.take_along_axis(t1, c_lo, axis=1), g0)
            x.append(g0)

        ns = []
        carry = zeros_t
        for k in range(bw):
            uu = s[k] & x[k]
            t, carry = add_with_carry(s[k], uu, carry)
            ns.append(t | (s[k] ^ uu))

        # frozen top bit: pattern position j - 16*bw gains iff the bit
        # is zero (positions < 0 / >= la hold 1 by the padding invariant)
        acc = acc + (~ns[0] & one_t).astype(jnp.int32)

        out = []
        for k in range(bw):
            hi = (ns[k + 1] << 31) if k + 1 < bw \
                else jnp.full((sub, LANE), 1 << 31, jnp.uint32)
            out.append((ns[k] >> 1) | hi)
        return acc, out

    if unroll_all:
        state = (acc0, s0)
        for jj in range(LB // 4):
            row = cand_ref[jj]
            for u in range(4):
                state = one_step(jj * 4 + u, row, u, state)
        acc, s = state
    else:
        ur = 16 if LB % 16 == 0 else 4

        def body(jj, state):
            acc, s = state
            for r in range(ur // 4):
                row = cand_ref[jj * (ur // 4) + r]
                for u in range(4):
                    acc, s = one_step(jj * ur + r * 4 + u, row, u,
                                      (acc, s))
            return acc, s

        acc, s = jax.lax.fori_loop(0, LB // ur, body, (acc0, s0))

    for k in range(bw):                 # drain the remaining register
        acc = acc + _popcount32(~s[k])
    out_ref[:, :] = acc


@functools.partial(jax.jit,
                   static_argnames=("LB", "ntab", "sub", "bw", "flat",
                                    "interpret"))
def _run(scal, tabs, cand3, lb2, *, LB, ntab, bw=1, sub=SUB, flat=True,
         interpret=False):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, ntab=ntab, sub=sub, bw=bw,
                             unroll_all=flat and not interpret)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((LB * ntab * bw, 1, LANE), lambda i: (0, 0, 0),
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


# ------------------------------------------------------- streamed band

#: text chars per grid step of the streamed band (matches band_kernel)
STREAM_CHUNK = 512


def _stream_kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref, acc_ref,
                   s_ref, *, CH: int, ntab: int, sub: int, bw: int,
                   nchunks: int):
    """Sliding-band LCS over STREAMED text chunks (sibling of
    ``band_kernel._stream_kernel``): the S register + LCS accumulator
    carry across chunks in VMEM scratch while the pre-funneled per-step
    tables stream through the second grid axis — indel/ratio cutoffs
    then cost O(bw) per char at ANY bucket length (the
    ``lcs_seq.rs:267-341`` banded asymptotics at scan scale).

    Stopping after ``max(lb)`` steps is exact: past a candidate's length
    the padding never matches, so stepping only moves zeros from the
    register into the dropped-bit accumulator, and the final drain
    popcounts whatever remains in the register either way.
    """
    t = pl.program_id(1)
    lb = lb_ref[:, :]
    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros_t = jnp.zeros((sub, LANE), jnp.uint32)
    one_t = jnp.full((sub, LANE), 1, jnp.uint32)

    @pl.when(t == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros((sub, LANE), jnp.int32)
        for k in range(bw):
            s_ref[k] = ones_t

    base = t * CH

    def one_step(jl, row, u, state):
        acc, s = state
        c = ((row >> jnp.uint32(8 * u))
             & jnp.uint32(0xFF)).astype(jnp.int32)
        if ntab == 2:
            c_lo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            c_lo = c
            chi = None
        x = []
        for k in range(bw):
            t0 = jnp.broadcast_to(tab_ref[(jl * ntab) * bw + k],
                                  (sub, LANE))
            g0 = jnp.take_along_axis(t0, c_lo, axis=1)
            if ntab == 2:
                t1 = jnp.broadcast_to(tab_ref[(jl * ntab + 1) * bw + k],
                                      (sub, LANE))
                g0 = jnp.where(chi,
                               jnp.take_along_axis(t1, c_lo, axis=1), g0)
            x.append(g0)
        ns = []
        carry = zeros_t
        for k in range(bw):
            uu = s[k] & x[k]
            tt, carry = add_with_carry(s[k], uu, carry)
            ns.append(tt | (s[k] ^ uu))
        acc = acc + (~ns[0] & one_t).astype(jnp.int32)
        out = []
        for k in range(bw):
            hi = (ns[k + 1] << 31) if k + 1 < bw \
                else jnp.full((sub, LANE), 1 << 31, jnp.uint32)
            out.append((ns[k] >> 1) | hi)
        return acc, out

    ur = 16
    assert CH % ur == 0

    def body(jj, state):
        acc, *s = state
        s = list(s)
        for r in range(ur // 4):
            row = cand_ref[jj * (ur // 4) + r]
            for u in range(4):
                acc, s = one_step(jj * ur + r * 4 + u, row, u, (acc, s))
        return (acc, *s)

    acc = acc_ref[:, :]
    s = [s_ref[k] for k in range(bw)]
    rem = jnp.max(lb) - base
    trips = jnp.clip((rem + (ur - 1)) // ur, 0, CH // ur)
    state = jax.lax.fori_loop(0, trips, body, (acc, *s))
    acc_ref[:, :] = state[0]
    for k in range(bw):
        s_ref[k] = state[1 + k]

    @pl.when(t == nchunks - 1)
    def _emit():
        total = acc_ref[:, :]
        for k in range(bw):
            total = total + _popcount32(~s_ref[k])
        out_ref[:, :] = total


@functools.partial(jax.jit,
                   static_argnames=("LB", "ntab", "sub", "bw", "interpret"))
def _run_stream(scal, tabs, cand3, lb2, *, LB, ntab, bw=1, sub=SUB,
                interpret=False):
    CH = STREAM_CHUNK
    assert LB % CH == 0, (LB, CH)
    nblocks = cand3.shape[1] // sub
    nchunks = LB // CH
    kern = functools.partial(_stream_kernel, CH=CH, ntab=ntab, sub=sub,
                             bw=bw, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nblocks, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((CH * ntab * bw, 1, LANE), lambda i, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH // 4, sub, LANE), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((sub, LANE), jnp.int32),
            pltpu.VMEM((bw, sub, LANE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scal, tabs, cand3, lb2)


def lcs_banded_stream_1v_many(query: np.ndarray, cand3, lb2, *,
                              cutoff: int, mode: str = "byte",
                              sub: int = SUB, cmax: int | None = None,
                              interpret: bool = False) -> jnp.ndarray:
    """Banded LCS similarity over long (>1024-char) candidate buckets.

    Same contract as :func:`lcs_banded_1v_many`; bucket length must be a
    multiple of ``STREAM_CHUNK``.
    """
    q = np.asarray(query)
    la = int(q.size)
    if not 0 <= cutoff <= MAX_CUTOFF:
        raise ValueError(f"cutoff {cutoff} outside [0, {MAX_CUTOFF}]")
    LB = int(cand3.shape[0]) * 4
    if (mode == "byte" and cmax is not None and cmax < LANE
            and (la == 0 or int(q.max()) < LANE)):
        mode = "local"
    ntab = 2 if mode == "byte" else 1
    bw = band_words(cutoff)
    scal = jnp.array([la, cutoff], jnp.int32)
    stabs = jnp.asarray(build_shifted_tables(q, mode, LB, bw))
    return _run_stream(scal, stabs, cand3, lb2, LB=LB, ntab=ntab, bw=bw,
                       sub=sub, interpret=interpret)


def lcs_banded_1v_many(query: np.ndarray, cand3, lb2, *, cutoff: int,
                       mode: str = "byte", sub: int = SUB, staged=None,
                       cmax: int | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Banded one-vs-many LCS similarity -> [B/128, 128] i32.

    ``cutoff`` is the INDEL-distance band bound: similarities are exact
    for candidates with ``indel <= cutoff``; others only guaranteed to
    come back <= the true LCS (their indel overestimates, so the
    caller's indel/ratio cutoff mask rejects exactly the right set).
    Requires ``0 <= cutoff <= MAX_CUTOFF`` and a bucket within
    ``FAST_MAX_LB``; callers fall back to the full kernel otherwise.

    ``cmax``: the corpus's max char value, if the caller knows it.  When
    query and corpus both fit 7 bits (ASCII — the common case), one
    128-entry table per band word serves instead of byte mode's two +
    select, cutting the gather cost of the step by ~40%.
    """
    q = np.asarray(query)
    la = int(q.size)
    if not 0 <= cutoff <= MAX_CUTOFF:
        raise ValueError(f"cutoff {cutoff} outside [0, {MAX_CUTOFF}]")
    LB = int(cand3.shape[0]) * 4
    if LB > FAST_MAX_LB:
        raise ValueError(f"bucket {LB} > {FAST_MAX_LB}")
    if (mode == "byte" and cmax is not None and cmax < LANE
            and (la == 0 or int(q.max()) < LANE)):
        mode = "local"                # 7-bit chars: raw values ARE the ids
    ntab = 2 if mode == "byte" else 1
    bw = band_words(cutoff)
    scal = jnp.array([la, cutoff], jnp.int32)
    if staged is not None:
        stabs = staged
    else:
        stabs = jnp.asarray(build_shifted_tables(q, mode, LB, bw))
    return _run(scal, stabs, cand3, lb2, LB=LB, ntab=ntab, bw=bw, sub=sub,
                flat=LB * bw <= FLAT_MAX_STEPS, interpret=interpret)
