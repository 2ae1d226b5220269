"""Pallas TPU kernel: one-vs-many banded Levenshtein under a score cutoff.

The reference's sliding-band variant (``/root/reference/src/distance/
levenshtein.rs:509-617``): when the diagonal band ``2*cutoff+1`` fits one
machine word, VP/VN hold only the band (top bits of the word) and slide
down one pattern position per text char — O(lb) per pair *independent of
the pattern length* (PM window gathers aside).  On u32 lanes the band
fits for ``score_cutoff <= 15``.

Two phases over text chars (both folded into one loop with scalar
selects):

* diagonal phase (first ``la - cutoff`` chars): the band's bottom row
  moves with the text; ``dist += (D0 & 1<<31) == 0``;
* horizontal phase (rest): the band has hit the pattern's last row;
  ``dist`` tracks HP/HN at a per-step-decreasing bit position.

The early ``break_score`` exit (``levenshtein.rs:565-567``) is a CPU
work-saver; here every candidate computes fully and results above the
cutoff are masked to ``BIG`` (SURVEY.md hard part #3 — identical accept /
reject semantics, and accepted values are exact).

The PM window crossing u32 word boundaries uses scalar funnel shifts
(start position is uniform across lanes), so per step the cost is
``W`` table gathers + ~25 band ops + per-step scalar shift setup.
Measured on v5e the scalar-shift setup makes one banded step cost about
two full Myers words, so the *dynamic* kernel only wins for long
patterns (W >= ~6), where the full kernel's per-step cost grows with W
and the band's stays flat.

The **fast table-driven variant** (``_fast_kernel``, routed for buckets
``LB <= FAST_MAX_LB``) removes that setup entirely: the band semiwidth
is pinned at ``16*bw - 1`` for a static word count ``bw`` in {1, 2, 3}
(cutoffs up to ``MAX_CUTOFF_FAST == 47``) regardless of the caller's
(dynamic) cutoff, so the band register's bit 0 sits at the
*host-computable* pattern position ``j - 16*bw`` — the funnel shifts
move into :func:`build_shifted_tables`, applied once per (step, table
entry, band word) on the host instead of per (step, candidate) on the
VPU.  Table rows are stored un-broadcast and broadcast in-kernel before
the gather (measured free, ``experiments/table_bcast_probe.py``), so
even 3-word-band tables for 1024-char buckets fit VMEM.  The horizontal
phase swaps the dynamic ``hbit`` shift for per-step probe masks from an
SMEM table (:func:`probe_table`).  In-kernel, ``j`` is then ONLY a
table index; for short buckets the text loop is fully flattened so
every index is a compile-time constant, longer buckets (and interpret
mode, where XLA-CPU goes superlinear on flat bodies beyond ~56 steps)
use a ``fori_loop`` form.  A wider-than-requested band computes a
superset of the DP cells with identical values, and the final masks
still apply the caller's true cutoff, so accept/reject semantics are
unchanged (``levenshtein.rs:565-567`` contract).  Measured v5e per-step
cost is ~0.57x a full W=2 Myers step per band word (flat form), which
makes ``score_cutoff`` a device-time win at practical lengths instead
of only for W >= 6 patterns; the multi-word bands extend that to the
reference's ``O(ceil(K/word)*M)`` cutoff asymptotics
(``levenshtein.rs:48``) for cutoffs up to 47.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitpack import add_with_carry
from .lev_kernel import LANE, SUB, build_pm_tables

BIG = np.int32(1 << 29)


def band_words(cutoff: int) -> int:
    """u32 words needed for a pinned band of semiwidth >= cutoff
    (``16 * bw - 1 >= cutoff``)."""
    return max(1, -(-(cutoff + 1) // 16))


def _kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref, *, LB: int,
            W: int, ntab: int, sub: int):
    la = scal_ref[0]
    cutoff = scal_ref[1]
    lb = lb_ref[:, :]

    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    vp0 = ones_t << (31 - cutoff).astype(jnp.uint32)   # cutoff+1 top bits
    vn0 = jnp.zeros((sub, LANE), jnp.uint32)
    dist0 = jnp.broadcast_to(cutoff, (sub, LANE)).astype(jnp.int32)
    pstart = jnp.maximum(la - cutoff, 0)               # phase-2 start step

    def one_char(j, row, u, state):
        dist, vp, vn = state
        c = ((row >> jnp.uint32(8 * u)) & jnp.uint32(0xFF)).astype(jnp.int32)
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None

        def word(w):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                return jnp.where(chi, t1, t0)
            return t0

        # PM window of 32 pattern bits starting at `start` (scalar)
        start = j + cutoff + 1 - 32
        neg = start < 0
        sp = jnp.maximum(start, 0)
        widx = sp // 32
        wpos = (sp % 32).astype(jnp.uint32)
        w0 = word(0)
        pm_lo = w0
        pm_hi = jnp.zeros_like(w0)
        for w in range(W):
            if w > 0:
                sel = widx == w
                pm_lo = jnp.where(sel, word(w), pm_lo)
            if w + 1 < W:
                pm_hi = jnp.where(widx == w, word(w + 1), pm_hi)
        pm_j = (pm_lo >> wpos) | jnp.where(
            wpos == 0, 0, pm_hi << (jnp.uint32(32) - wpos))
        pm_j = jnp.where(neg, w0 << (-start).astype(jnp.uint32), pm_j)

        x = pm_j
        d0 = (((x & vp) + vp) ^ vp) | x | vn
        hp = vn | ~(d0 | vp)
        hn = d0 & vp

        # distance delta: diagonal vs horizontal phase (scalar select)
        diag_delta = 1 - ((d0 >> 31) & 1).astype(jnp.int32)
        hbit = jnp.maximum(30 - (j - pstart), 0).astype(jnp.uint32)
        hor_delta = (((hp >> hbit) & 1).astype(jnp.int32)
                     - ((hn >> hbit) & 1).astype(jnp.int32))
        delta = jnp.where(j < pstart, diag_delta, hor_delta)
        dist = jnp.where(j < lb, dist + delta, dist)

        nvp = hn | ~((d0 >> 1) | hp)
        nvn = (d0 >> 1) & hp
        return dist, nvp, nvn

    def body(jj, state):
        row = cand_ref[jj]
        for u in range(4):
            state = one_char(jj * 4 + u, row, u, state)
        return state

    trips = (jnp.max(lb) + 3) // 4
    dist, _, _ = jax.lax.fori_loop(0, trips, body, (dist0, vp0, vn0))

    dist = jnp.where(lb == 0, la, dist)
    dist = jnp.where(jnp.abs(la - lb) > cutoff, BIG, dist)
    dist = jnp.where(dist > cutoff, BIG, dist)
    out_ref[:, :] = dist


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "sub", "interpret"))
def _run(scal, tabs, cand3, lb2, *, LB, W, ntab, sub=SUB, interpret=False):
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
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
        interpret=interpret,
    )(scal, tabs, cand3, lb2)


def build_shifted_tables(query: np.ndarray, mode: str, LB: int,
                         bw: int = 1) -> np.ndarray:
    """Per-step pre-funneled PM tables for the static band kernel.

    The static kernel's band register is ``32 * bw`` bits whose bit 0 at
    step ``j`` is the constant pattern position ``j - 16 * bw``, so the
    funnel shift over the word-blocked tables can be applied ONCE per
    (step, table-entry, band-word) on the host instead of per (step,
    candidate) on the VPU: row ``(j * ntab + t) * bw + k`` maps char
    entry ``c`` (lane-indexed) to band word ``k``'s 32-bit window for
    step ``j``.  Shape ``(LB * ntab * bw, 1, LANE)`` u32 — rows are NOT
    broadcast across sublanes; the kernel broadcasts before the gather
    (measured free on v5e).  Rows whose window lies fully past the
    pattern are zero (those steps are frozen for every in-band candidate
    anyway).
    """
    q = np.asarray(query)
    la = int(q.size)
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    base = build_pm_tables(q, mode, sub=1)     # (W*ntab, 1, LANE) u32
    base = base.reshape(W, ntab, LANE)
    # vectorized over (step, band word): the per-row Python loop cost
    # 2.5 ms at LB=512 — a visible per-query cost on the scanner's
    # banded route (the kernel itself runs in ~2 ms)
    j = np.arange(LB)[:, None]
    k = np.arange(bw)[None, :]
    start = j - 16 * bw + 32 * k               # (LB, bw)
    widx = start >> 5                          # floor div (negatives -> -1)
    wpos = (start & 31).astype(np.uint32)[..., None, None]
    pos = (start >= 0) & (widx < W)
    neg = (start < 0) & (start > -32)
    b0 = base[np.clip(widx, 0, W - 1)]         # (LB, bw, ntab, LANE)
    b1 = base[np.clip(widx + 1, 0, W - 1)]
    win = b0 >> wpos
    hi = ((start & 31) != 0) & (widx + 1 < W) & (start >= 0)
    win = win | np.where(hi[..., None, None],
                         b1 << ((np.uint32(32) - wpos) & np.uint32(31)), 0)
    win = np.where(pos[..., None, None], win, 0)
    nshift = np.clip(-start, 0, 31).astype(np.uint32)[..., None, None]
    win = np.where(neg[..., None, None], base[0][None, None] << nshift,
                   win)
    out = np.transpose(win, (0, 2, 1, 3))      # (LB, ntab, bw, LANE)
    return np.ascontiguousarray(out.reshape(LB * ntab * bw, 1, LANE))


def probe_table(la: int, LB: int, bw: int = 1) -> np.ndarray:
    """Horizontal-phase probe bits per step -> ``(LB, bw)`` u32.

    Row ``j`` is all-zero during the diagonal phase; afterwards exactly
    one word holds ``1 << bit`` for the register position of the
    pattern's last row: ``32*bw - 2 - (j - pstart)``.  Expired probes
    (``j - pstart > 32*bw - 2``) only occur for ``|la-lb| > 16*bw - 1``,
    rejected by the length mask."""
    maxc = 16 * bw - 1
    pstart = max(la - maxc, 0)
    out = np.zeros((LB, bw), np.uint32)
    for j in range(LB):
        k = j - pstart
        if 0 <= k <= 32 * bw - 2:
            rb = 32 * bw - 2 - k
            out[j, rb // 32] = np.uint32(1) << np.uint32(rb % 32)
    return out


def _fast_kernel(scal_ref, probe_ref, tab_ref, cand_ref, lb_ref, out_ref,
                 *, LB: int, ntab: int, sub: int, bw: int,
                 unroll_all: bool):
    """Table-driven band kernel (band semiwidth pinned at ``16*bw - 1``).

    Per step the work is one table gather per band word (two + select in
    byte mode) from the pre-funneled per-step tables, the ``bw``-word
    band recurrence with add carries chained low-to-high and the
    register shifted right one bit across words, and the distance delta
    — no funnel shifts, no word selects, no loop-carried probe.  The
    probe trajectory rides in SMEM (:func:`probe_table`), so only ``la``
    and the caller's true cutoff (final masks) are dynamic and one
    compilation serves the bucket.

    Table rows are stored once (``(rows, 1, LANE)``) and broadcast
    across sublanes in-kernel before the gather — measured bit-equal and
    speed-neutral on v5e (``experiments/table_bcast_probe.py``), cutting
    table VMEM 32x so multi-word bands and 1024-char buckets fit.

    ``unroll_all=True`` flattens the text loop so every table index is a
    compile-time constant — measured v5e: the fori_loop form's dynamic
    leading-dim loads + per-trip overhead cost ~1.2x a full-kernel step,
    the flat form ~0.57x (sweep in ``experiments/README.md``).  The fori
    form serves longer buckets (flat-body compile time grows with
    ``LB * bw``) and interpret mode, where XLA-CPU goes superlinear on
    flat bodies beyond ~56 steps.
    """
    la = scal_ref[0]
    cut = scal_ref[1]
    lb = lb_ref[:, :]
    maxc = 16 * bw - 1

    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros_t = jnp.zeros((sub, LANE), jnp.uint32)
    vp0 = []
    for k in range(bw):                 # top 16*bw bits of the register
        lo_bit = 32 * k
        if lo_bit >= 16 * bw:
            vp0.append(ones_t)
        elif lo_bit + 32 <= 16 * bw:
            vp0.append(zeros_t)
        else:
            vp0.append(ones_t << jnp.uint32(16 * bw - lo_bit))
    vn0 = [zeros_t] * bw
    dist0 = jnp.full((sub, LANE), maxc, jnp.int32)

    def one_step(j, row, u, state):
        dist, vp, vn = state
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

        d0, hp, hn = [], [], []
        carry = zeros_t
        for k in range(bw):
            a = x[k] & vp[k]
            s, carry = add_with_carry(a, vp[k], carry)
            d0k = (s ^ vp[k]) | x[k] | vn[k]
            d0.append(d0k)
            hp.append(vn[k] | ~(d0k | vp[k]))
            hn.append(d0k & vp[k])

        diag_delta = 1 - ((d0[bw - 1] >> 31) & 1).astype(jnp.int32)
        hor_delta = jnp.zeros((sub, LANE), jnp.int32)
        pany = probe_ref[j, 0]
        for k in range(bw):
            pk = probe_ref[j, k]                       # SMEM scalar
            if k:
                pany = pany | pk
            hor_delta = hor_delta \
                + ((hp[k] & pk) != 0).astype(jnp.int32) \
                - ((hn[k] & pk) != 0).astype(jnp.int32)
        delta = jnp.where(pany != 0, hor_delta, diag_delta)
        dist = jnp.where(j < lb, dist + delta, dist)

        nvp, nvn = [], []
        for k in range(bw):
            hi = (d0[k + 1] << 31) if k + 1 < bw else zeros_t
            d0s = (d0[k] >> 1) | hi
            nvp.append(hn[k] | ~(d0s | hp[k]))
            nvn.append(d0s & hp[k])
        return dist, nvp, nvn

    if unroll_all:
        state = (dist0, vp0, vn0)
        for jj in range(LB // 4):
            row = cand_ref[jj]
            for u in range(4):
                state = one_step(jj * 4 + u, row, u, state)
        dist, _, _ = state
    else:
        # unroll several packed rows per trip: the per-iteration fixed
        # cost (trip bookkeeping + dynamic leading-dim table loads) is
        # what makes the fori form ~2x the flat form per step
        ur = 16 if LB % 16 == 0 else 4

        def body(jj, state):
            dist, vp, vn = state
            for r in range(ur // 4):
                row = cand_ref[jj * (ur // 4) + r]
                for u in range(4):
                    dist, vp, vn = one_step(jj * ur + r * 4 + u, row, u,
                                            (dist, vp, vn))
            return dist, vp, vn

        trips = (jnp.max(lb) + (ur - 1)) // ur
        dist, _, _ = jax.lax.fori_loop(0, trips, body, (dist0, vp0, vn0))

    dist = jnp.where(lb == 0, la, dist)
    dist = jnp.where(jnp.abs(la - lb) > cut, BIG, dist)
    dist = jnp.where(dist > cut, BIG, dist)
    out_ref[:, :] = dist


@functools.partial(jax.jit,
                   static_argnames=("LB", "ntab", "sub", "bw", "flat",
                                    "interpret"))
def _run_fast(scal, probe, tabs, cand3, lb2, *, LB, ntab, bw=1, sub=SUB,
              flat=True, interpret=False):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_fast_kernel, LB=LB, ntab=ntab, sub=sub,
                             bw=bw, unroll_all=flat and not interpret)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(scal, probe, tabs, cand3, lb2)


MAX_CUTOFF = 15        # dynamic kernel: band 2*cutoff+1 <= 32 (one word)
MAX_CUTOFF_FAST = 47   # static kernel: up to a 3-word band
FLAT_MAX_STEPS = 512   # flat-unroll budget in LB * bw (compile-time bound)
FAST_MAX_LB = 1024     # fori-form cap: candidate-block VMEM (LB/4,sub,LANE)


def stage_banded(query: np.ndarray, mode: str, LB: int, cutoff: int):
    """Pre-upload the static band kernel's per-step tables + probes for
    repeated scans of one query (mirrors ``lev_kernel.stage_query``)."""
    import jax

    q = np.asarray(query)
    bw = band_words(cutoff)
    stabs = jax.device_put(jnp.asarray(build_shifted_tables(q, mode, LB,
                                                            bw)))
    probe = jax.device_put(jnp.asarray(probe_table(int(q.size), LB, bw)))
    return stabs, probe


def lev_banded_1v_many(query: np.ndarray, cand3, lb2, *, cutoff: int,
                       mode: str = "byte", sub: int = SUB, staged=None,
                       interpret: bool = False) -> jnp.ndarray:
    """Banded one-vs-many Levenshtein -> [B/128, 128] i32.

    Results are exact when ``<= cutoff``; candidates above the cutoff
    yield ``>= BIG`` (the caller's cutoff mask hides them).  Requires
    ``0 <= cutoff <= MAX_CUTOFF_FAST`` and ``cutoff < len(query)`` — the
    reference likewise only routes band-smaller-than-pattern cases here
    (``levenshtein.rs:1164-1172``); callers fall back to the full kernel
    otherwise.  Cutoffs above ``MAX_CUTOFF`` need the static multi-word
    variant (query longer than the pinned band, bucket within
    ``FAST_MAX_LB``) — a ``ValueError`` tells the caller to fall back.
    """
    q = np.asarray(query)
    la = int(q.size)
    if not 0 <= cutoff <= MAX_CUTOFF_FAST:
        raise ValueError(f"cutoff {cutoff} outside [0, {MAX_CUTOFF_FAST}]")
    if cutoff >= la:
        raise ValueError("banded kernel requires cutoff < len(query)")
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    scal = jnp.array([la, cutoff], jnp.int32)
    bw = band_words(cutoff)
    if la > 16 * bw - 1 and LB <= FAST_MAX_LB:
        # static variant: band semiwidth pinned at 16*bw - 1 (needs
        # band < la), true cutoff applied in the final mask
        if staged is not None:
            stabs, probe = staged
        else:
            stabs = jnp.asarray(build_shifted_tables(q, mode, LB, bw))
            probe = jnp.asarray(probe_table(la, LB, bw))
        return _run_fast(scal, probe, stabs, cand3, lb2, LB=LB,
                         ntab=ntab, bw=bw, sub=sub,
                         flat=LB * bw <= FLAT_MAX_STEPS,
                         interpret=interpret)
    if cutoff > MAX_CUTOFF:
        raise ValueError(
            f"cutoff {cutoff} > {MAX_CUTOFF} needs the static band kernel "
            f"(query > {16 * bw - 1} chars, bucket <= {FAST_MAX_LB})")
    tabs = jnp.asarray(build_pm_tables(q, mode, sub))
    return _run(scal, tabs, cand3, lb2, LB=LB, W=W, ntab=ntab, sub=sub,
                interpret=interpret)


# ------------------------------------------------------- streamed band

#: text chars per grid step of the streamed band (matches stream_kernel)
STREAM_CHUNK = 512


def _stream_kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref,
                   dist_ref, vp_ref, vn_ref, *, CH: int, ntab: int,
                   sub: int, bw: int, nchunks: int):
    """Static-width band over STREAMED text chunks.

    The :func:`_fast_kernel` band (semiwidth pinned at ``16*bw - 1``,
    pre-funneled per-step tables) with the text as a second grid
    dimension: the band register (dist, VP, VN) carries across chunks in
    VMEM scratch, and the per-step tables stream chunk-by-chunk through
    the same grid axis, so buckets of any length run under a cutoff at
    ``O(bw)`` per char — the reference's ``O(ceil(K/64)*M)`` cutoff
    asymptotics (``levenshtein.rs:48``) at scan scale.  The horizontal-
    phase probe is computed dynamically from the global step (the probe
    table would not fit SMEM at stream lengths): ``hbit = 32*bw - 2 -
    (j - pstart)``, one select per band word.
    """
    t = pl.program_id(1)
    la = scal_ref[0]
    cut = scal_ref[1]
    lb = lb_ref[:, :]
    maxc = 16 * bw - 1
    pstart = jnp.maximum(la - maxc, 0)

    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros_t = jnp.zeros((sub, LANE), jnp.uint32)

    @pl.when(t == 0)
    def _init():
        dist_ref[:, :] = jnp.full((sub, LANE), maxc, jnp.int32)
        for k in range(bw):             # top 16*bw bits of the register
            lo_bit = 32 * k
            if lo_bit >= 16 * bw:
                vp_ref[k] = ones_t
            elif lo_bit + 32 <= 16 * bw:
                vp_ref[k] = zeros_t
            else:
                vp_ref[k] = ones_t << jnp.uint32(16 * bw - lo_bit)
            vn_ref[k] = zeros_t

    base = t * CH

    def one_step(jl, row, u, state):
        dist, vp, vn = state
        j = base + jl                       # global text step (dynamic)
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

        d0, hp, hn = [], [], []
        carry = zeros_t
        for k in range(bw):
            a = x[k] & vp[k]
            s, carry = add_with_carry(a, vp[k], carry)
            d0k = (s ^ vp[k]) | x[k] | vn[k]
            d0.append(d0k)
            hp.append(vn[k] | ~(d0k | vp[k]))
            hn.append(d0k & vp[k])

        diag_delta = 1 - ((d0[bw - 1] >> 31) & 1).astype(jnp.int32)
        # dynamic probe: register bit of the pattern's last row
        hbit = jnp.clip(32 * bw - 2 - (j - pstart), 0, 32 * bw - 1)
        hor_delta = jnp.zeros((sub, LANE), jnp.int32)
        for k in range(bw):
            pk = jnp.where(hbit // 32 == k,
                           jnp.uint32(1) << (hbit % 32).astype(jnp.uint32),
                           jnp.uint32(0))
            hor_delta = hor_delta \
                + ((hp[k] & pk) != 0).astype(jnp.int32) \
                - ((hn[k] & pk) != 0).astype(jnp.int32)
        delta = jnp.where(j < pstart, diag_delta, hor_delta)
        dist = jnp.where(j < lb, dist + delta, dist)

        nvp, nvn = [], []
        for k in range(bw):
            hi = (d0[k + 1] << 31) if k + 1 < bw else zeros_t
            d0s = (d0[k] >> 1) | hi
            nvp.append(hn[k] | ~(d0s | hp[k]))
            nvn.append(d0s & hp[k])
        return dist, nvp, nvn

    ur = 16
    assert CH % ur == 0

    def body(jj, state):
        dist, *rest = state
        vp = list(rest[:bw])
        vn = list(rest[bw:])
        for r in range(ur // 4):
            row = cand_ref[jj * (ur // 4) + r]
            for u in range(4):
                dist, vp, vn = one_step(jj * ur + r * 4 + u, row, u,
                                        (dist, vp, vn))
        return (dist, *vp, *vn)

    dist = dist_ref[:, :]
    vp = [vp_ref[k] for k in range(bw)]
    vn = [vn_ref[k] for k in range(bw)]
    rem = jnp.max(lb) - base
    trips = jnp.clip((rem + (ur - 1)) // ur, 0, CH // ur)
    state = jax.lax.fori_loop(0, trips, body, (dist, *vp, *vn))
    dist_ref[:, :] = state[0]
    for k in range(bw):
        vp_ref[k] = state[1 + k]
        vn_ref[k] = state[1 + bw + k]

    @pl.when(t == nchunks - 1)
    def _emit():
        d = dist_ref[:, :]
        d = jnp.where(lb == 0, la, d)
        d = jnp.where(jnp.abs(la - lb) > cut, BIG, d)
        d = jnp.where(d > cut, BIG, d)
        out_ref[:, :] = d


@functools.partial(jax.jit,
                   static_argnames=("LB", "ntab", "sub", "bw", "interpret"))
def _run_stream(scal, tabs, cand3, lb2, *, LB, ntab, bw, sub=SUB,
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
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((bw, SUB, LANE), jnp.uint32),
            pltpu.VMEM((bw, SUB, LANE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scal, tabs, cand3, lb2)


def lev_banded_stream_1v_many(query: np.ndarray, cand3, lb2, *,
                              cutoff: int, mode: str = "byte",
                              sub: int = SUB, staged=None,
                              interpret: bool = False) -> jnp.ndarray:
    """Banded scan over long (>1024-char) candidate buckets.

    Same contract as :func:`lev_banded_1v_many` (exact when <= cutoff,
    ``BIG`` above it); bucket length must be a multiple of
    ``STREAM_CHUNK``.  Worth routing when the query word count clears
    the band cost (callers use ``W >= 2*bw + 1``, the fori-form rule).
    """
    q = np.asarray(query)
    la = int(q.size)
    if not 0 <= cutoff <= MAX_CUTOFF_FAST:
        raise ValueError(f"cutoff {cutoff} outside [0, {MAX_CUTOFF_FAST}]")
    if cutoff >= la:
        raise ValueError("banded kernel requires cutoff < len(query)")
    bw = band_words(cutoff)
    if la <= 16 * bw - 1:
        raise ValueError("pinned band must be narrower than the pattern")
    LB = int(cand3.shape[0]) * 4
    ntab = 2 if mode == "byte" else 1
    scal = jnp.array([la, cutoff], jnp.int32)
    stabs = (staged[0] if staged is not None
             else jnp.asarray(build_shifted_tables(q, mode, LB, bw)))
    return _run_stream(scal, stabs, cand3, lb2, LB=LB, ntab=ntab, bw=bw,
                       sub=sub, interpret=interpret)
