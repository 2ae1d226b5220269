"""Pallas TPU kernel: one-vs-many unrestricted Damerau-Levenshtein.

Zhao-Sahni semantics (``/root/reference/src/distance/damerau_levenshtein.rs
:111-168``) in a lane-transposed layout: **DP columns live on the lane
axis** and 32 candidate rows share a tile on the sublane axis.  This
orientation makes every per-row structure a plain vector op:

* the within-row last-match propagation (``l`` and ``D[i-2][l-1]``) and
  the left-neighbour min-plus recurrence are log2(SEG)-step Hillis-Steele
  scans over lanes (``pltpu.roll`` + mask — the per-element gathers that
  scalarise in the XLA formulation never appear);
* the last-row structure ``K[j]`` is an elementwise running max;
* the query walks one char per ``fori_loop`` row step (SMEM scalar
  reads), so trips == the true query length.

Layout/throughput details (2nd-generation kernel):

* the 128 lanes split into ``128/SEG`` independent **segments** (SEG = 64
  or 128), one candidate per segment — a len<=64 corpus packs TWO
  candidates per row, doubling throughput at the bench's len-64 point.
  DP boundary columns (``D[i][0] = i`` etc.) are injected as masked roll
  fill values instead of a dedicated border lane, so all SEG lanes carry
  text.
* the last-match scan carries ``(col, D[i-2][col-1])`` packed into ONE
  int32 (``val << 7 | col``), halving the scan's roll count — rolls are
  the kernel's dominant cost.

O(N*M) like the reference; use the bit-parallel kernels for metrics that
admit them.  First compile through the remote tunnel is slow (~minutes;
persistently cached after).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBC = 32          # fallback candidate rows per tile (sublane axis)
SUB_CAP = 512      # preferred tile height: each grid step runs the whole
                   # la-iteration row loop, so its fixed per-iteration cost
                   # amortizes over the tile's candidates — measured v5e
                   # len-64: sub=32 -> 0.90M pairs/s, 128 -> 3.1M,
                   # 512 -> 5.9M (saturates; 1024 is flat)


def pick_sub(rows: int) -> int:
    """Largest power-of-2 tile height <= SUB_CAP dividing the row count."""
    s = SUB_CAP
    while s > 8 and rows % s:
        s //= 2
    return s if rows % s == 0 else SUBC
BIG = np.int32(1 << 23)     # "infinity"; real scores stay far below, and
                            # (BIG << 7) still fits int32 for the packed scan
MAX_TEXT = LANE    # candidates up to 128 chars (SEG = 128)


def _kernel(q_ref, la_ref, b_ref, lb_ref, out_ref, st_ref, *, sub: int,
            seg: int):
    la = la_ref[0]
    b_tile = b_ref[:, :]                     # [sub, 128] candidate chars
    lb = lb_ref[:, :]                        # [sub, 128] per-segment lens
    jj = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    local = jj & (seg - 1)                   # lane index within segment
    jcol = local + 1                         # 1-based DP column
    shifts = [1 << k for k in range(seg.bit_length() - 1)]
    SENT = jnp.int32(int(BIG) << 7)

    def shift_seg(x, sh, fill):
        """x[j - sh] within the segment, else ``fill``."""
        r = pltpu.roll(x, sh, 1)
        return jnp.where(local >= sh, r, fill)

    def minplus_prefix(x):
        """new[j] = min over k<=j of (x[k] + (j-k))  (segment prefix)."""
        y = x - jcol
        for sh in shifts:
            y = jnp.minimum(y, shift_seg(y, sh, BIG))
        return y + jcol

    # carries live in VMEM scratch (not fori_loop carries): iota/constant
    # inits otherwise enter the loop sublane-replicated and Mosaic cannot
    # relayout the carry ("Invalid relayout" at the while boundary)
    st_ref[0] = jcol                         # D_{i-1}; D[0][j] = j
    st_ref[1] = jnp.full((sub, LANE), BIG, jnp.int32)    # D_{i-2}
    st_ref[2] = jnp.zeros((sub, LANE), jnp.int32)        # K[j]
    st_ref[3] = jnp.full((sub, LANE), BIG, jnp.int32)    # FR[j]

    def step(i, carry):
        dim1 = st_ref[0]
        dim2 = st_ref[1]
        K = st_ref[2]
        FR = st_ref[3]
        ai = q_ref[i - 1]
        eq_i = b_tile == ai                  # pads hold -2, never match

        # D_{i-2}[jcol-1]; boundary D_{i-2}[0] = i-2 (only exists for i>=2)
        d2fill = jnp.where(i >= 2, i - 2, BIG)
        dim2_up = shift_seg(dim2, 1, d2fill)
        # packed last-match scan: at lane j, (col, D_{i-2}[col-1]) of the
        # highest matching column <= jcol
        e = jnp.where(eq_i, (dim2_up << 7) | jcol, SENT)
        for sh in shifts:
            e = jnp.where((e & 127) > 0, e, shift_seg(e, sh, SENT))
        es = shift_seg(e, 1, SENT)           # last match strictly < jcol
        L = es & 127
        t = jnp.where(L >= 1, es >> 7, BIG)

        diag = shift_seg(dim1, 1, i - 1)     # D_{i-1}[jcol-1]; D[i-1][0]=i-1
        cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
        cand = jnp.minimum(diag + cost, dim1 + 1)

        case1 = jnp.where(jcol - L == 1, FR + (i - K), BIG)
        case2 = jnp.where((i - K == 1) & (jcol - L != 1), t + (jcol - L),
                          BIG)
        tr = jnp.minimum(case1, case2)
        cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))
        cand = jnp.minimum(cand, i + jcol)   # boundary D[i][0] = i

        new = minplus_prefix(cand)

        # D_{i-1}[jcol-2]: boundary i-1 at jcol==2, nonexistent at jcol==1
        r2 = pltpu.roll(dim1, 2, 1)
        dim1_m2 = jnp.where(local >= 2, r2,
                            jnp.where(jcol == 2, i - 1, BIG))
        st_ref[3] = jnp.where(eq_i, dim1_m2, FR)
        st_ref[2] = jnp.maximum(K, jnp.where(eq_i, i, 0))
        st_ref[1] = dim1
        st_ref[0] = new
        return carry

    jax.lax.fori_loop(1, la + 1, step, 0)
    out_ref[:, :] = jnp.where(jcol == lb, st_ref[0], 0)


@functools.partial(jax.jit, static_argnames=("sub", "seg", "interpret"))
def _run(q, la, b_tiles, lb_tiles, *, sub=SUBC, seg=LANE, interpret=False):
    nblocks = b_tiles.shape[0] // sub
    kern = functools.partial(_kernel, sub=sub, seg=seg)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_tiles.shape[0], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, sub, LANE), jnp.int32)],
        interpret=interpret,
    )(q, la, b_tiles, lb_tiles)


def pick_seg(maxlen: int) -> int:
    """Smallest power-of-2 segment holding the bucket: every halving
    doubles the candidates per row AND drops one Hillis-Steele shift
    from both lane scans (short dictionary corpora pack 4-8 per row)."""
    if maxlen > MAX_TEXT:
        raise ValueError(f"candidates longer than {MAX_TEXT} need the XLA "
                         "Damerau path")
    for s in (16, 32, 64):
        if maxlen <= s:
            return s
    return 128


def prepare_corpus_cols(chars: np.ndarray, lens: np.ndarray,
                        sub: int = SUBC, seg: int | None = None):
    """[B, LB<=128] i32 corpus -> segment-lane tiles for the Damerau kernel.

    Candidate ``c`` occupies lanes ``[(c % nsegs) * seg, ...)`` of row
    ``c // nsegs`` (``nsegs = 128 // seg``), char ``j`` (1-based) at
    segment-local lane ``j - 1``; padding holds -2 (never matches).
    ``B`` must be a multiple of ``sub * nsegs``.
    Returns ``(b_tiles [B/nsegs, 128], lb_tiles [B/nsegs, 128], seg)``.
    """
    B, LB = chars.shape
    if seg is None:
        seg = pick_seg(LB)
    nsegs = LANE // seg
    R = B // nsegs
    b = np.full((R, nsegs, seg), -2, np.int32)
    b[:, :, :LB] = np.where(chars < 0, -2, chars).reshape(R, nsegs, LB)
    lbt = np.broadcast_to(
        lens.astype(np.int32).reshape(R, nsegs, 1), (R, nsegs, seg))
    return b.reshape(R, LANE), lbt.reshape(R, LANE).copy(), seg


def _encode_query_rows(query: np.ndarray):
    """(qpad int32, la) — row-loop query prep shared by both forms."""
    q = np.asarray(query, np.int64)
    la = int(q.size)
    if q.size and (q.max() > np.iinfo(np.int32).max or q.min() < -1):
        # out-of-domain query chars can never match (host sentinel)
        q = np.where((q < 0) | (q > np.iinfo(np.int32).max), -3, q)
    # pad the query to a 32-multiple so compilations are keyed per bucket;
    # the row loop stops at the true length
    LQ = -(-max(la, 1) // 32) * 32
    qpad = np.full(LQ, -3, np.int32)
    qpad[:la] = q.astype(np.int32)
    return qpad, la


def _sharded(run_fn, mesh, statics: dict):
    """shard_map a damerau ``_run`` over the candidate-row axis."""
    import jax
    from jax.sharding import PartitionSpec as P

    def local(*a):
        return run_fn(*a, **statics)

    def wrap(*args):
        # all leading args replicated; the last two (b, lb tiles) sharded
        nrep = len(args) - 2
        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(),) * nrep + (P("data", None), P("data", None)),
            out_specs=P("data", None), check_vma=False))(*args)

    return wrap


def damerau_1v_many(query: np.ndarray, b_tiles, lb_tiles, *, seg: int = LANE,
                    interpret: bool = False, mesh=None,
                    variant: str = "auto") -> jnp.ndarray:
    """One-vs-many unrestricted Damerau distances -> int32[B].

    ``b_tiles``/``lb_tiles``/``seg`` from :func:`prepare_corpus_cols`;
    the query may be any length (row loop runs exactly ``len(query)``
    steps).  With a multi-device ``mesh``, the kernel runs per corpus
    shard via ``shard_map`` (rows pre-sharded ``P("data", None)``).

    ``variant``: "pack" = per-row packed last-match scan (:func:`_kernel`),
    "lp" = hoisted lastpos tiles (:func:`_kernel_lp`); "auto" picks "lp"
    when the query has <= ND_CAP distinct chars (always true for byte
    queries up to 64 distinct symbols).
    """
    nsegs = LANE // seg
    # per-candidate lengths, kept ON DEVICE: an np.asarray here would pull
    # the full lb tile array host-side on every call (~16 MB/call at the
    # bench shape — measured as the dominant cost of the whole scan)
    lens = jnp.asarray(lb_tiles)[:, ::seg].reshape(-1)
    qpad, la = _encode_query_rows(query)
    if la == 0:
        return lens.astype(jnp.int32)
    lp = None
    if variant != "pack":
        lp = _encode_query_lp(query)
        if lp is None and variant == "lp":
            raise ValueError(f"> {ND_CAP} distinct query chars")
    ndev = len(mesh.devices.flat) if mesh is not None else 1
    rows = int(b_tiles.shape[0])
    sub = pick_sub(rows // ndev if ndev > 1 else rows)
    if lp is not None:
        qpad, ci, qd, la, nd = lp
        args = (jnp.asarray(qpad), jnp.asarray(ci), jnp.asarray(qd),
                jnp.array([la], jnp.int32))
        statics = dict(sub=sub, seg=seg, nd=nd, interpret=interpret)
        run_fn = _run_lp
    else:
        args = (jnp.asarray(qpad), jnp.array([la], jnp.int32))
        statics = dict(sub=sub, seg=seg, interpret=interpret)
        run_fn = _run
    if ndev > 1:
        out = _sharded(run_fn, mesh, statics)(
            *args, b_tiles, lb_tiles)
    else:
        out = run_fn(*args, jnp.asarray(b_tiles), jnp.asarray(lb_tiles),
                     **statics)
    summed = jnp.sum(out.reshape(-1, nsegs, seg), axis=2).reshape(-1)
    # segments with an empty candidate never hit jcol == lb: dist = la
    return jnp.where(lens == 0, la, summed)


# ---------------------------------------------- lastpos variant (<= 128)

def _kernel_lp(q_ref, ci_ref, qd_ref, la_ref, b_ref, lb_ref, out_ref,
               st_ref, lp_ref, *, sub: int, seg: int, nd: int):
    """Zhao-Sahni rows with the last-match scan hoisted out of the row loop.

    The scan's position part ``L(i, j) = last column l < j with
    b[l] == a_i`` depends only on the query CHAR, not the row index — so
    the 6-7-roll packed Hillis-Steele scan per row collapses to a
    precompute: one strict-lastpos tile per distinct query char (4 tiles
    packed per int32 in ``lp_ref``), built once per candidate tile with
    one max-scan each.  Per row the kernel then does one dynamic scratch
    load + one lane gather of ``D_{i-2}[L-1]`` (the PM-table
    ``take_along_axis`` mechanism) instead of the packed scan — per-row
    rolls drop from ~16 to ~9.  Semantics identical to :func:`_kernel`
    (``damerau_levenshtein.rs:111-168``).
    """
    la = la_ref[0]
    b_tile = b_ref[:, :]
    lb = lb_ref[:, :]
    jj = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    local = jj & (seg - 1)
    jcol = local + 1
    seg_base = jj - local
    sbm2 = seg_base - 2                      # gather base for D_{i-2}[L-1]
    shifts = [1 << k for k in range(seg.bit_length() - 1)]

    def shift_seg(x, sh, fill):
        r = pltpu.roll(x, sh, 1)
        return jnp.where(local >= sh, r, fill)

    # precompute: strict lastpos per distinct query char, 4 packed / int32
    for w in range(nd // 4):
        word = jnp.zeros((sub, LANE), jnp.int32)
        for k in range(4):
            m = jnp.where(b_tile == qd_ref[w * 4 + k], jcol, 0)
            for sh in shifts:
                m = jnp.maximum(m, shift_seg(m, sh, 0))
            word = word | (shift_seg(m, 1, 0) << (8 * k))
        lp_ref[w] = word

    # D rows ping-pong between st_ref[0]/st_ref[1] by row parity (saves a
    # full-tile copy per row); K/FR live in st_ref[2]/st_ref[3]
    st_ref[0] = jcol                         # D_{i-1} for i=1; D[0][j] = j
    st_ref[1] = jnp.full((sub, LANE), BIG, jnp.int32)    # D_{i-2}
    st_ref[2] = jnp.zeros((sub, LANE), jnp.int32)        # K[j]
    st_ref[3] = jnp.full((sub, LANE), BIG, jnp.int32)    # FR[j]

    def step(i, carry):
        par = i & 1
        dim1 = st_ref[1 - par]
        dim2 = st_ref[par]
        K = st_ref[2]
        FR = st_ref[3]
        ai = q_ref[i - 1]
        ci = ci_ref[i - 1]
        eq_i = b_tile == ai

        # L = last match strictly < jcol (segment-local 1-based column)
        word = lp_ref[ci >> 2]
        L = jax.lax.shift_right_logical(word, (ci & 3) * 8) & 0xFF

        # t = D_{i-2}[L-1]: column L-1 lives at lane L-2 (L == 1 -> the
        # boundary D_{i-2}[0] = i-2; L == 0 -> no match, BIG)
        d2fill = jnp.where(i >= 2, i - 2, BIG)
        g = jnp.take_along_axis(dim2, jnp.maximum(sbm2 + L, seg_base),
                                axis=1)
        t = jnp.where(L >= 2, g, jnp.where(L == 1, d2fill, BIG))

        diag = shift_seg(dim1, 1, i - 1)     # D_{i-1}[jcol-1]; D[i-1][0]=i-1
        cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
        cand = jnp.minimum(diag + cost, dim1 + 1)

        # transposition terms (case1 self-guards: K==0 leaves FR at BIG)
        djL = jcol - L
        iK = i - K
        m1 = djL == 1
        tr = jnp.where(m1, FR + iK, t + djL)
        tr = jnp.where(m1 | (iK == 1), tr, BIG)
        cand = jnp.minimum(cand, jnp.where(eq_i, BIG, tr))

        # min-plus prefix; the D[i][0] = i boundary enters every lane as
        # a constant in y-space (value i at column 0)
        y = cand - jcol
        for sh in shifts:
            y = jnp.minimum(y, shift_seg(y, sh, BIG))
        new = jnp.minimum(y, i) + jcol

        r2 = pltpu.roll(dim1, 2, 1)
        dim1_m2 = jnp.where(local >= 2, r2,
                            jnp.where(jcol == 2, i - 1, BIG))
        st_ref[3] = jnp.where(eq_i, dim1_m2, FR)
        st_ref[2] = jnp.where(eq_i, jnp.broadcast_to(i, (sub, LANE)), K)
        st_ref[par] = new                    # overwrite D_{i-2}: now D_i
        return carry

    jax.lax.fori_loop(1, la + 1, step, 0)
    final = jnp.where((la & 1) == 1, st_ref[1], st_ref[0])
    out_ref[:, :] = jnp.where(jcol == lb, final, 0)


@functools.partial(jax.jit, static_argnames=("sub", "seg", "nd",
                                             "interpret"))
def _run_lp(q, ci, qd, la, b_tiles, lb_tiles, *, sub=SUBC, seg=LANE, nd=8,
            interpret=False):
    nblocks = b_tiles.shape[0] // sub
    kern = functools.partial(_kernel_lp, sub=sub, seg=seg, nd=nd)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_tiles.shape[0], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, sub, LANE), jnp.int32),
                        pltpu.VMEM((nd // 4, sub, LANE), jnp.int32)],
        interpret=interpret,
    )(q, ci, qd, la, b_tiles, lb_tiles)


ND_CAP = 64        # beyond 64 distinct query chars the lastpos scratch
                   # would crowd VMEM (16 tiles @ sub=512 ~= 4 MB); the
                   # packed-scan kernel has no such limit and takes over


def _encode_query_lp(query: np.ndarray):
    """(qpad, ci, qd, la, nd) for the lastpos kernel, or None to fall
    back (``> ND_CAP`` distinct chars).  ``nd`` is padded to a multiple
    of 8 so compilations key per bucket, not per exact distinct count."""
    qpad, la = _encode_query_rows(query)
    uniq, inv = np.unique(qpad[:la], return_inverse=True)
    if uniq.size > ND_CAP:
        return None
    nd = max(8, -(-int(uniq.size) // 8) * 8)
    qd = np.full(nd, -3, np.int32)           # -3 never matches corpus
    qd[:uniq.size] = uniq
    ci = np.zeros(qpad.size, np.int32)
    ci[:la] = inv.astype(np.int32)
    return qpad, ci, qd, la, nd


# --------------------------------------- sequential-pair variant (<= 128)

SEQ_SUB = 16       # tile height for the sequential-pair kernel: measured
                   # v5e len-64 B=2^18 — sub=8 26.7M, 16 35.5M, 32 35.0M
                   # pairs/s (evidence/damerau_seq_probe_r3.log)


def _kernel_sq(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
               kk_ref, *, sub: int, lbmax: int):
    """Zhao-Sahni with **pairs in lanes** and a fully sequential (i, j) DP.

    The lane-transposed kernels above pay two log2(SEG)-step Hillis-
    Steele scans per row (last-match + min-plus) — ~60% of their runtime
    and an ~8.7M pairs/s design ceiling (experiments/damerau_ablate.py).
    Here each of the ``sub * 128`` lanes owns one whole candidate and the
    DP walks (row i, column j) sequentially, so both scans collapse into
    register carries: the min-plus lane scan becomes ``d_left + 1`` and
    the last-match scan becomes the per-row ``(reg_l, reg_t)`` pair.
    Every op is elementwise; the three O(lb) row structures (D ping-pong
    by row parity, FR, K) live in VMEM scratch indexed by the unrolled
    column.  Semantics identical to :func:`_kernel`
    (``damerau_levenshtein.rs:111-168``); measured 35.5M len-64 pairs/s
    vs 8.4M for the lane-transposed form.
    """
    la = la_ref[0]
    lb = lb_ref[0]
    zeros = jnp.zeros((sub, LANE), jnp.int32)
    bigs = jnp.full((sub, LANE), BIG, jnp.int32)

    # D[0][jcol] = jcol in buffer 0; D[-1] = BIG in buffer 1
    for j in range(lbmax):
        dp_ref[0, j] = zeros + (j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        kk_ref[j] = zeros

    def row(i, carry):
        par = i & 1                       # D[i] overwrites D[i-2] (same par)
        ai = q_ref[i - 1]
        d_left = zeros + i                # D[i][0] = i
        d_diag = zeros + (i - 1)          # D[i-1][jcol-1] at jcol = 1
        d_diag_prev = bigs                # D[i-1][jcol-2] (none at jcol = 1)
        d2_left = jnp.where(i >= 2, zeros + (i - 2), bigs)  # D[i-2][0]
        reg_l = zeros                     # last col < jcol with b == a_i
        reg_t = bigs                      # D[i-2][reg_l - 1]
        for j in range(lbmax):
            jcol = j + 1
            c2 = b_ref[j]
            eq = c2 == ai
            d_up = dp_ref[1 - par, j]     # D[i-1][jcol]
            d2 = dp_ref[par, j]           # D[i-2][jcol] (read before write)
            fr = fr_ref[j]
            k = kk_ref[j]
            cost = jnp.where(eq, 0, 1)
            cand = jnp.minimum(d_diag + cost,
                               jnp.minimum(d_up, d_left) + 1)
            djL = jcol - reg_l
            iK = i - k
            m1 = djL == 1
            tr = jnp.where(m1, fr + iK, reg_t + djL)
            tr = jnp.where(m1 | (iK == 1), tr, BIG)
            new = jnp.minimum(cand, jnp.where(eq, BIG, tr))
            fr_ref[j] = jnp.where(eq, d_diag_prev, fr)
            kk_ref[j] = jnp.where(eq, zeros + i, k)
            reg_t = jnp.where(eq, d2_left, reg_t)
            reg_l = jnp.where(eq, jcol, reg_l)
            dp_ref[par, j] = new
            d_left = new
            d_diag_prev = d_diag
            d_diag = d_up
            d2_left = d2
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    res = zeros + la                      # lb == 0 -> distance la
    parf = la & 1
    for j in range(lbmax):
        res = jnp.where(lb == j + 1, dp_ref[parf, j], res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "interpret"))
def _run_sq(q, la, b_cols, lb_t, *, sub=SEQ_SUB, lbmax=64, interpret=False):
    nblocks = b_cols.shape[0] // lbmax
    kern = functools.partial(_kernel_sq, sub=sub, lbmax=lbmax)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lbmax, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, lbmax, sub, LANE), jnp.int32),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int32),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int32)],
        interpret=interpret,
    )(q, la, b_cols, lb_t)


BIG16 = np.int16(1 << 12)
SEQ_LA_MAX_I16 = 3900   # BIG16 must dominate every real distance
                        # (<= max(la, 128)); sums stay < 1<<13 << 32767


def _kernel_sq16(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
                 kk_ref, *, sub: int, lbmax: int):
    """Pure-int16 :func:`_kernel_sq` — two elements per VPU lane, ~2x.

    Identical Zhao-Sahni algebra; every VECTOR operand is int16 (corpus
    tiles staged int16, scalars cast before broadcast, constants
    explicit) — mixing 32-bit-layout i1 masks into 16-bit selects is a
    Mosaic "Invalid relayout".  Valid for ``la <= SEQ_LA_MAX_I16``.
    """
    I16 = jnp.int16
    la = la_ref[0]
    lb = lb_ref[0]
    zeros = jnp.zeros((sub, LANE), I16)
    bigs = jnp.full((sub, LANE), BIG16, I16)
    one = I16(1)

    for j in range(lbmax):
        dp_ref[0, j] = zeros + I16(j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        kk_ref[j] = zeros

    def row(i, carry):
        par = i & 1
        ai = q_ref[i - 1].astype(I16)
        i16 = i.astype(I16)
        ii = zeros + i16
        d_left = ii
        d_diag = ii - one
        d_diag_prev = bigs
        d2_left = jnp.where(ii >= I16(2), ii - I16(2), bigs)
        reg_l = zeros
        reg_t = bigs
        for j in range(lbmax):
            jcol = I16(j + 1)
            c2 = b_ref[j]
            eq = c2 == ai
            d_up = dp_ref[1 - par, j]
            d2 = dp_ref[par, j]
            fr = fr_ref[j]
            k = kk_ref[j]
            cost = jnp.where(eq, I16(0), one)
            cand = jnp.minimum(d_diag + cost,
                               jnp.minimum(d_up, d_left) + one)
            djL = jcol - reg_l
            iK = i16 - k
            m1 = djL == one
            tr = jnp.where(m1, fr + iK, reg_t + djL)
            tr = jnp.where(m1 | (iK == one), tr, BIG16)
            new = jnp.minimum(cand, jnp.where(eq, BIG16, tr))
            fr_ref[j] = jnp.where(eq, d_diag_prev, fr)
            kk_ref[j] = jnp.where(eq, ii, k)
            reg_t = jnp.where(eq, d2_left, reg_t)
            reg_l = jnp.where(eq, zeros + jcol, reg_l)
            dp_ref[par, j] = new
            d_left = new
            d_diag_prev = d_diag
            d_diag = d_up
            d2_left = d2
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    res = jnp.zeros((sub, LANE), I16) + la.astype(I16)
    parf = la & 1
    for j in range(lbmax):
        res = jnp.where(lb == I16(j + 1), dp_ref[parf, j], res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "interpret"))
def _run_sq16(q, la, b_cols16, lb16, *, sub=SEQ_SUB, lbmax=64,
              interpret=False):
    nblocks = b_cols16.shape[0] // lbmax
    kern = functools.partial(_kernel_sq16, sub=sub, lbmax=lbmax)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lbmax, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int16),
        scratch_shapes=[pltpu.VMEM((2, lbmax, sub, LANE), jnp.int16),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int16),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int16)],
        interpret=interpret,
    )(q, la, b_cols16, lb16)


def _kernel_sq16m(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
                  kk_ref, *, sub: int, lbmax: int):
    """Compare-free int16 :func:`_kernel_sq` — mask algebra only.

    v5e Mosaic rejects ``arith.cmpi`` on packed int16 vectors ("Target
    does not support this comparison"), so this body never compares:
    equality masks come from ``~(((d) | -(d)) >> 15)`` (all-ones where
    ``d == 0``), less-than masks from ``(a - b) >> 15``, selects from
    ``y ^ ((x ^ y) & m)`` and minima from the same mask — add/sub/
    bitwise/arithmetic-shift only.  Value bounds: every operand pair
    subtracted stays within +-2^15 (scores < ``BIG16 + SEQ_LA_MAX_I16``,
    chars <= ``I16_CHAR_MAX``).  Semantics identical to
    :func:`_kernel_sq16` (verified against it and the oracle in
    interpret mode).

    Hardware verdict (round 4): v5e Mosaic rejects BOTH i16 bodies at the
    real (16, 128) tile shape — this one too, because int16 ``sub``/
    ``neg``/shifts also fail to lower (``evidence/i16_ops_probe_r4.log``,
    ``evidence/damerau_sq16m_probe_r4.log``).  Kept for interpret-mode
    conformance and future hardware; the production default stays the
    int32 :func:`_kernel_sq`.
    """
    I16 = jnp.int16
    la = la_ref[0]
    lb = lb_ref[0]
    zeros = jnp.zeros((sub, LANE), I16)
    bigs = jnp.full((sub, LANE), BIG16, I16)
    one = I16(1)
    fifteen = I16(15)

    def eq_m(a, b):                    # -1 where a == b
        d = a - b
        return ~((d | -d) >> fifteen)

    def sel(m, x, y):                  # where(m, x, y), m in {-1, 0}
        return y ^ ((x ^ y) & m)

    def min_(a, b):                    # elementwise min, |a-b| < 2^15
        return sel((a - b) >> fifteen, a, b)

    for j in range(lbmax):
        dp_ref[0, j] = zeros + I16(j + 1)
        dp_ref[1, j] = bigs
        fr_ref[j] = bigs
        kk_ref[j] = zeros

    def row(i, carry):
        par = i & 1
        ai = q_ref[i - 1].astype(I16)
        i16 = i.astype(I16)
        ii = zeros + i16
        d_left = ii
        d_diag = ii - one
        d_diag_prev = bigs
        d2_left = sel(~((ii - I16(2)) >> fifteen), ii - I16(2), bigs)
        reg_l = zeros
        reg_t = bigs
        for j in range(lbmax):
            jcol = I16(j + 1)
            c2 = b_ref[j]
            eqm = eq_m(c2, ai)
            d_up = dp_ref[1 - par, j]
            d2 = dp_ref[par, j]
            fr = fr_ref[j]
            k = kk_ref[j]
            cost = (~eqm) & one
            cand = min_(d_diag + cost, min_(d_up, d_left) + one)
            djL = jcol - reg_l
            iK = i16 - k
            m1 = eq_m(djL, zeros + one)
            mik = eq_m(iK, zeros + one)
            tr = sel(m1, fr + iK, reg_t + djL)
            tr = sel(m1 | mik, tr, bigs)
            new = min_(cand, sel(eqm, bigs, tr))
            fr_ref[j] = sel(eqm, d_diag_prev, fr)
            kk_ref[j] = sel(eqm, ii, k)
            reg_t = sel(eqm, d2_left, reg_t)
            reg_l = sel(eqm, zeros + jcol, reg_l)
            dp_ref[par, j] = new
            d_left = new
            d_diag_prev = d_diag
            d_diag = d_up
            d2_left = d2
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    res = zeros + la.astype(I16)
    parf = la & 1
    for j in range(lbmax):
        res = sel(eq_m(lb, zeros + I16(j + 1)), dp_ref[parf, j], res)
    out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("sub", "lbmax", "interpret"))
def _run_sq16m(q, la, b_cols16, lb16, *, sub=SEQ_SUB, lbmax=64,
               interpret=False):
    nblocks = b_cols16.shape[0] // lbmax
    kern = functools.partial(_kernel_sq16m, sub=sub, lbmax=lbmax)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lbmax, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int16),
        scratch_shapes=[pltpu.VMEM((2, lbmax, sub, LANE), jnp.int16),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int16),
                        pltpu.VMEM((lbmax, sub, LANE), jnp.int16)],
        interpret=interpret,
    )(q, la, b_cols16, lb16)


I16_CHAR_MAX = 16000   # int16 staging only valid when every char id fits
                       # AND |char - char| < 2^15 for the mask-algebra
                       # body's compare-free equality (the dense vocab
                       # remap keeps real corpora far below this)

def prepare_corpus_seq(chars: np.ndarray, lens: np.ndarray,
                       sub: int = SEQ_SUB, lbmax: int | None = None,
                       dtype=np.int32):
    """[B, LB<=128] i32 corpus -> pair-per-lane tiles for :func:`_kernel_sq`.

    Pair ``c`` sits at (block ``c // (sub*128)``, sublane
    ``(c % (sub*128)) // 128``, lane ``c % 128``); char ``j`` of the pair
    on leading row ``block * lbmax + j``.  ``B`` must be a multiple of
    ``sub * 128``.  ``lbmax`` is padded to a multiple of 16 so
    compilations key per bucket class, not per exact corpus width.
    Returns ``(b_cols [nb*lbmax, sub, 128], lb [nb, sub, 128], lbmax)``
    staged with ``dtype``.

    ``dtype`` defaults to **int32** — the hardware-validated route
    (oracle-exact on v5e, ~35M len-64 pairs/s).  Pass ``np.int16`` only
    for the experimental :func:`_kernel_sq16` body (two elements per VPU
    lane); Mosaic on v5e currently rejects its int16 vector compares
    ("Target does not support this comparison"), so
    :func:`damerau_seq_1v_many` only routes int16 tiles to it when
    ``RAPIDFUZZ_TPU_DAMERAU_I16=1`` is set, and falls back to the int32
    body (widening on device) otherwise.
    """
    B, LB = chars.shape
    if lbmax is None:
        lbmax = -(-max(LB, 16) // 16) * 16
    assert LB <= lbmax and B % (sub * LANE) == 0
    nb = B // (sub * LANE)
    dt = np.dtype(dtype)
    if dt == np.int16 and chars.max(initial=0) > I16_CHAR_MAX:
        dt = np.dtype(np.int32)
    b = np.full((nb, sub, LANE, lbmax), -2, dt)
    b[..., :LB] = np.where(chars < 0, -2, chars).reshape(nb, sub, LANE, LB)
    b_cols = b.transpose(0, 3, 1, 2).reshape(nb * lbmax, sub, LANE)
    lb_t = lens.astype(dt).reshape(nb, sub, LANE)
    return (np.ascontiguousarray(b_cols), np.ascontiguousarray(lb_t),
            lbmax)


def stage_query_seq(query: np.ndarray):
    """Pre-upload a query for the sequential-pair kernels: through the
    axon tunnel each host->device transfer costs ~1-1.5 ms of latency,
    so the two per-call uploads (padded query + length scalar) dominated
    the banded scan's fixed dispatch cost (measured ~5 ms/call vs
    ~2.3 ms with staging) — the BatchComparator pattern
    (``levenshtein.rs:1625-1657``) applied to the query side."""
    qpad, la = _encode_query_rows(query)
    return jnp.asarray(qpad), jnp.array([la], jnp.int32), la


def damerau_seq_1v_many(query: np.ndarray, b_cols, lb_t, *, lbmax: int,
                        sub: int = SEQ_SUB, interpret: bool = False,
                        mesh=None, staged=None) -> jnp.ndarray:
    """One-vs-many Damerau on the sequential-pair kernel -> int32[B].

    ``b_cols``/``lb_t``/``lbmax`` from :func:`prepare_corpus_seq`; any
    query length (the row loop runs ``len(query)`` steps).  The default
    (and hardware-validated) body is the int32 :func:`_kernel_sq`.
    int16-staged corpora ride the experimental :func:`_kernel_sq16` only
    when ``RAPIDFUZZ_TPU_DAMERAU_I16=1`` (Mosaic on v5e rejects its i16
    vector compares today) and ``la <= SEQ_LA_MAX_I16``; otherwise int16
    tiles are widened on device for the int32 body.  With a mesh, shards
    over the block axis via ``shard_map`` (``nb % ndev == 0``).
    """
    if staged is not None:
        # pre-uploaded int32 query (stage_query_seq): skip the per-call
        # host encode + the two device transfers; i16 staging n/a
        qj, laj, la = staged
        if la == 0:
            return jnp.reshape(jnp.asarray(lb_t), (-1,)).astype(jnp.int32)
        b_cols = jnp.asarray(b_cols)
        lb_t = jnp.asarray(lb_t)
        if b_cols.dtype == jnp.int16:
            b_cols = b_cols.astype(jnp.int32)
            lb_t = lb_t.astype(jnp.int32)
        if mesh is None or len(mesh.devices.flat) <= 1:
            return _run_sq_flat(qj, laj, b_cols, lb_t, sub=sub,
                                lbmax=lbmax, interpret=interpret)
        from jax.sharding import PartitionSpec as P
        run = functools.partial(_run_sq, sub=sub, lbmax=lbmax,
                                interpret=interpret)
        out = jax.jit(jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(), P("data", None, None),
                      P("data", None, None)),
            out_specs=P("data", None, None), check_vma=False))(
                qj, laj, b_cols, lb_t)
        return jnp.reshape(out, (-1,)).astype(jnp.int32)
    qpad, la = _encode_query_rows(query)
    if la == 0:
        return jnp.reshape(jnp.asarray(lb_t), (-1,)).astype(jnp.int32)
    i16_env = os.environ.get("RAPIDFUZZ_TPU_DAMERAU_I16", "")
    i16 = (np.dtype(getattr(b_cols, "dtype", np.int32)) == np.int16
           and la <= SEQ_LA_MAX_I16
           and (interpret or i16_env in ("1", "mask")))
    if i16:
        # query chars beyond int16 can't match any int16-staged corpus
        # char; replace with -3 (pads are -2) so the cast can't alias
        qpad = np.where(np.abs(qpad) > I16_CHAR_MAX, -3, qpad)
        body = _run_sq16m if i16_env == "mask" else _run_sq16
        run = functools.partial(body, sub=sub, lbmax=lbmax,
                                interpret=interpret)
    else:
        run = functools.partial(_run_sq, sub=sub, lbmax=lbmax,
                                interpret=interpret)
        flat = functools.partial(_run_sq_flat, sub=sub, lbmax=lbmax,
                                 interpret=interpret)
    b_cols = jnp.asarray(b_cols)
    lb_t = jnp.asarray(lb_t)
    if not i16 and b_cols.dtype == jnp.int16:
        b_cols = b_cols.astype(jnp.int32)       # rare: la > SEQ_LA_MAX_I16
        lb_t = lb_t.astype(jnp.int32)
    args = (jnp.asarray(qpad), jnp.array([la], jnp.int32))
    if mesh is not None and len(mesh.devices.flat) > 1:
        from jax.sharding import PartitionSpec as P

        out = jax.jit(jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(), P("data", None, None),
                      P("data", None, None)),
            out_specs=P("data", None, None), check_vma=False))(
                *args, b_cols, lb_t)
    elif not i16:
        return flat(*args, b_cols, lb_t)     # one dispatch end-to-end
    else:
        out = run(*args, b_cols, lb_t)
    return jnp.reshape(out, (-1,)).astype(jnp.int32)


# ------------------------------------ cutoff-banded sequential pairs

def _kernel_sqband(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref, fr_ref,
                   kk_ref, ch_ref, *, sub: int, lbmax: int, kband: int):
    """Cutoff-banded :func:`_kernel_sq`: O(k*M) instead of O(N*M).

    Every DP cell satisfies ``D[i][j] >= |i - j|`` (each edit op moves
    the length balance by at most one; a transposition moves it by zero
    and costs one), so under ``score_cutoff = k`` any cell with
    ``|i - j| > k`` is irrelevant: its true value exceeds the cutoff,
    and an optimal path with total cost <= k only touches cells whose
    value (hence ``|i - j|``) is <= k — including the jump cell
    ``D[k-1][l-1]`` a Zhao-Sahni transposition references, which lies on
    the path.  Out-of-band references therefore clamp to BIG; returned
    values are exact wherever the true distance is <= ``kband`` and some
    value > ``kband`` otherwise (callers mask on the cutoff).  The
    reference computes the full O(N*M) even under a cutoff
    (``damerau_levenshtein.rs:111-168`` uses it only as a Delta-len
    guard); the band discipline follows its Levenshtein small-band
    kernel (``levenshtein.rs:509-617``).

    Layout: band-relative storage.  Position ``p`` of row ``i`` holds
    column ``j = i - kband + p`` (W = 2k+1 positions).  With ping-pong
    parity buffers this makes every neighbour read a static offset in
    the unrolled position walk:

    * ``D[i-1][j-1]`` (diag)  = ``dp[1-par, p]``
    * ``D[i-1][j]``  (up)     = ``dp[1-par, p+1]``
    * ``D[i-2][j-1]``         = ``dp[par, p+1]`` (read before overwrite)
    * ``FR[j]`` / ``K[j]``    = ``fr[p+1]`` / ``kk[p+1]`` — the per-row
      band shift merges with their update (write at ``p``)

    Boundary column-0 values are stored in-band (``D[i][0] = i``), so
    boundaries propagate through the same reads; pad slots (index W)
    hold BIG/0 and are never written, so the column entering the band
    at the right edge picks up fresh inits for free.  The text chars
    ride a shifting window in scratch: one dynamic leading-axis load
    per row (the new rightmost column), the rest static copies.
    """
    W = 2 * kband + 1
    la = la_ref[0]
    lb = lb_ref[0]
    zeros = jnp.zeros((sub, LANE), jnp.int32)
    bigs = jnp.full((sub, LANE), BIG, jnp.int32)

    # row 0 (parity 0): D[0][j] = j at position p = j + kband; cols < 0
    # don't exist (BIG).  row -1 (parity 1): all BIG.  pads: BIG.
    for p in range(W + 1):
        dp_ref[0, p] = (zeros + (p - kband)) if p >= kband and p < W \
            else bigs
        dp_ref[1, p] = bigs
        fr_ref[p] = bigs
        kk_ref[p] = zeros
    # char window for row 1: position p holds col 1 - kband + p
    for p in range(W):
        col = 1 - kband + p
        ch_ref[p] = b_ref[col - 1] if 1 <= col <= lbmax \
            else jnp.full((sub, LANE), -2, jnp.int32)

    def make_row(masked: bool):
        # rows i <= kband+1 can have band positions at or left of
        # column 0 and need boundary masking; rows past that have
        # jcol >= 2 at every position — the masks (and the boundary
        # d_left init) fold away in the main loop
        def row(i, carry):
            par = i & 1
            ai = q_ref[i - 1]
            if masked:
                # left init: D[i][i-k-1] — boundary i iff that col is 0
                d_left = jnp.where(i == kband + 1, zeros + i, bigs)
            else:
                d_left = bigs
            d_diag_prev = bigs            # D[i-1][i-k-2]: out of band
            reg_l = zeros                 # last in-row match col < jcol
            reg_t = bigs                  # D[i-2][reg_l - 1]
            for p in range(W):
                jcol = i - kband + p      # traced scalar
                c2 = ch_ref[p]
                if p >= 1:
                    # position p's char is next row's char at p-1: the
                    # window shift rides the walk for free
                    ch_ref[p - 1] = c2
                eq = c2 == ai
                d_diag = dp_ref[1 - par, p]
                d_up = dp_ref[1 - par, p + 1]
                d2_left = dp_ref[par, p + 1]   # D[i-2][jcol-1]
                fr = fr_ref[p + 1]
                k = kk_ref[p + 1]
                cost = jnp.where(eq, 0, 1)
                cand = jnp.minimum(d_diag + cost,
                                   jnp.minimum(d_up, d_left) + 1)
                djL = jcol - reg_l
                iK = i - k
                m1 = djL == 1
                tr = jnp.where(m1, fr + iK, reg_t + djL)
                tr = jnp.where(m1 | (iK == 1), tr, BIG)
                new = jnp.minimum(cand, jnp.where(eq, BIG, tr))
                if masked:
                    new = jnp.where(jcol >= 1, new,
                                    jnp.where(jcol == 0, zeros + i,
                                              bigs))
                fr_ref[p] = jnp.where(eq, d_diag_prev, fr)
                kk_ref[p] = jnp.where(eq, zeros + i, k)
                reg_t = jnp.where(eq, d2_left, reg_t)
                reg_l = jnp.where(eq, zeros + jcol, reg_l)
                dp_ref[par, p] = new
                d_left = new
                d_diag_prev = d_diag
            # the new rightmost column for row i+1: one dynamic load
            idx = i + kband               # 0-based char index of new col
            safe = jnp.minimum(idx, lbmax - 1)
            cw = b_ref[pl.dslice(safe, 1)][0]
            ch_ref[W - 1] = jnp.where(idx < lbmax, cw,
                                      jnp.full((sub, LANE), -2,
                                               jnp.int32))
            return carry

        return row

    split = jnp.minimum(la, kband + 1)
    jax.lax.fori_loop(1, split + 1, make_row(True), 0)
    jax.lax.fori_loop(kband + 2, la + 1, make_row(False), 0)

    # D[la][lb] sits at position lb - la + kband (col-0 boundary storage
    # makes lb == 0 come out as la automatically); |la - lb| > kband
    # keeps BIG — above any cutoff <= kband, masked by the caller
    res = bigs
    parf = la & 1
    for p in range(W):
        res = jnp.where(lb == la - kband + p, dp_ref[parf, p], res)
    out_ref[0] = res


@functools.partial(jax.jit,
                   static_argnames=("sub", "lbmax", "kband", "interpret"))
def _run_sqband(q, la, b_cols, lb_t, *, sub=SEQ_SUB, lbmax=64, kband=7,
                interpret=False):
    W = 2 * kband + 1
    nblocks = b_cols.shape[0] // lbmax
    kern = functools.partial(_kernel_sqband, sub=sub, lbmax=lbmax,
                             kband=kband)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lbmax, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, W + 1, sub, LANE), jnp.int32),
                        pltpu.VMEM((W + 1, sub, LANE), jnp.int32),
                        pltpu.VMEM((W + 1, sub, LANE), jnp.int32),
                        pltpu.VMEM((W, sub, LANE), jnp.int32)],
        interpret=interpret,
    )(q, la, b_cols, lb_t)


@functools.partial(jax.jit,
                   static_argnames=("sub", "lbmax", "interpret"))
def _run_sq_flat(q, la, b_cols, lb_t, *, sub=SEQ_SUB, lbmax=64,
                 interpret=False):
    """Single-dispatch public form: pallas call + flatten + int32 cast
    fused into one program (each eager jnp op outside jit is a separate
    device dispatch — through the axon tunnel that is ~2.3 ms of fixed
    host cost per op, measured as the gap between a wrapped and an
    unwrapped scan's dispatch amortization)."""
    out = _run_sq(q, la, b_cols, lb_t, sub=sub, lbmax=lbmax,
                  interpret=interpret)
    return jnp.reshape(out, (-1,)).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("sub", "lbmax", "kband", "interpret"))
def _run_sqband_flat(q, la, b_cols, lb_t, *, sub=SEQ_SUB, lbmax=64,
                     kband=7, interpret=False):
    out = _run_sqband(q, la, b_cols, lb_t, sub=sub, lbmax=lbmax,
                      kband=kband, interpret=interpret)
    return jnp.reshape(out, (-1,)).astype(jnp.int32)


DAM_BAND_BUCKETS = (3, 7, 15)   # static band radii (compile keys); a
                                # cutoff routes to the smallest bucket
                                # >= it — a wider band is still exact
                                # for all results <= the cutoff


def pick_dam_band(cutoff: int, lbmax: int):
    """Band-bucket radius for ``score_cutoff``, or None when the band
    would not be meaningfully narrower than the full column walk."""
    for kb in DAM_BAND_BUCKETS:
        if cutoff <= kb:
            if 2 * kb + 1 <= lbmax // 2:
                return kb
            return None
    return None


def damerau_seqband_1v_many(query: np.ndarray, b_cols, lb_t, *,
                            lbmax: int, kband: int, sub: int = SEQ_SUB,
                            interpret: bool = False,
                            mesh=None, staged=None) -> jnp.ndarray:
    """One-vs-many cutoff-banded Damerau -> int32[B].

    ``b_cols``/``lb_t``/``lbmax`` from :func:`prepare_corpus_seq`
    (int32 staging).  Results are exact wherever the true distance is
    <= ``kband`` and exceed ``kband`` otherwise — callers must mask on
    a ``score_cutoff <= kband``.  ``staged`` (from
    :func:`stage_query_seq`) skips the per-call query upload.
    """
    if staged is not None:
        qj, laj, la = staged
    else:
        qpad, la = _encode_query_rows(query)
    if la == 0:
        return jnp.reshape(jnp.asarray(lb_t), (-1,)).astype(jnp.int32)
    if staged is None:
        qj, laj = jnp.asarray(qpad), jnp.array([la], jnp.int32)
    b_cols = jnp.asarray(b_cols)
    lb_t = jnp.asarray(lb_t)
    if b_cols.dtype == jnp.int16:
        b_cols = b_cols.astype(jnp.int32)
        lb_t = lb_t.astype(jnp.int32)
    run = functools.partial(_run_sqband, sub=sub, lbmax=lbmax,
                            kband=kband, interpret=interpret)
    args = (qj, laj)
    if mesh is not None and len(mesh.devices.flat) > 1:
        from jax.sharding import PartitionSpec as P

        out = jax.jit(jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(), P("data", None, None),
                      P("data", None, None)),
            out_specs=P("data", None, None), check_vma=False))(
                *args, b_cols, lb_t)
        return jnp.reshape(out, (-1,)).astype(jnp.int32)
    return _run_sqband_flat(*args, b_cols, lb_t, sub=sub, lbmax=lbmax,
                            kband=kband, interpret=interpret)


# ------------------------- cutoff-banded sequential pairs, streamed text

DAM_BAND_CHUNK = 512      # text cols per grid step in the streamed form


def _kernel_sqband_stream(q_ref, la_ref, b_ref, lb_ref, out_ref, dp_ref,
                          fr_ref, kk_ref, ch_ref, *, sub: int, lbmax: int,
                          kband: int, nchunks: int):
    """:func:`_kernel_sqband` with the text streamed in CHUNK-col grid
    steps — O(k*M) Damerau for candidates of ANY bucket length.

    The |i-j| <= k band is length-independent: on an 8192-char
    dedup pair at k=15 it touches ~254k cells of the 67M-cell full DP.
    The band's char window advances one column per row, so chunking is
    natural: grid step ``c`` runs exactly the rows whose entering
    column ``i + k`` lies in chunk ``c`` (rows shift by -k relative to
    columns; no overlap blocks needed — the window itself carries the
    k columns of history).  Band state (dp/fr/kk/ch) persists in
    scratch across the sequential chunk axis; results emit after the
    last chunk.  Note under a cutoff k only candidates with
    ``|la - lb| <= k`` can pass at all, so the row walk's length is
    ~the candidate length — the long-dedup shape.  Semantics:
    ``damerau_levenshtein.rs:111-168`` under the cutoff contract of
    ``common.rs:33-46``; band discipline per ``levenshtein.rs:509-617``.
    """
    W = 2 * kband + 1
    CH = DAM_BAND_CHUNK
    la = la_ref[0]
    lb = lb_ref[0]
    c = pl.program_id(1)
    base = c * CH
    zeros = jnp.zeros((sub, LANE), jnp.int32)
    bigs = jnp.full((sub, LANE), BIG, jnp.int32)

    @pl.when(c == 0)
    def _init():
        for p in range(W + 1):
            dp_ref[0, p] = (zeros + (p - kband)) if p >= kband and p < W \
                else bigs
            dp_ref[1, p] = bigs
            fr_ref[p] = bigs
            kk_ref[p] = zeros
        # char window for row 1: position p holds col 1 - kband + p,
        # all within chunk 0 (col <= kband + 1 << CH)
        for p in range(W):
            col = 1 - kband + p
            ch_ref[p] = b_ref[col - 1] if col >= 1 \
                else jnp.full((sub, LANE), -2, jnp.int32)

    def make_row(masked: bool):
        def row(i, carry):
            par = i & 1
            ai = q_ref[i - 1]
            if masked:
                d_left = jnp.where(i == kband + 1, zeros + i, bigs)
            else:
                d_left = bigs
            d_diag_prev = bigs
            reg_l = zeros
            reg_t = bigs
            for p in range(W):
                jcol = i - kband + p
                c2 = ch_ref[p]
                if p >= 1:
                    ch_ref[p - 1] = c2
                eq = c2 == ai
                d_diag = dp_ref[1 - par, p]
                d_up = dp_ref[1 - par, p + 1]
                d2_left = dp_ref[par, p + 1]
                fr = fr_ref[p + 1]
                k = kk_ref[p + 1]
                cost = jnp.where(eq, 0, 1)
                cand = jnp.minimum(d_diag + cost,
                                   jnp.minimum(d_up, d_left) + 1)
                djL = jcol - reg_l
                iK = i - k
                m1 = djL == 1
                tr = jnp.where(m1, fr + iK, reg_t + djL)
                tr = jnp.where(m1 | (iK == 1), tr, BIG)
                new = jnp.minimum(cand, jnp.where(eq, BIG, tr))
                if masked:
                    new = jnp.where(jcol >= 1, new,
                                    jnp.where(jcol == 0, zeros + i,
                                              bigs))
                fr_ref[p] = jnp.where(eq, d_diag_prev, fr)
                kk_ref[p] = jnp.where(eq, zeros + i, k)
                reg_t = jnp.where(eq, d2_left, reg_t)
                reg_l = jnp.where(eq, zeros + jcol, reg_l)
                dp_ref[par, p] = new
                d_left = new
                d_diag_prev = d_diag
            # entering column for row i+1, from THIS chunk's block
            idx = i + kband                  # 0-based global col index
            loc = jnp.clip(idx - base, 0, CH - 1)
            cw = b_ref[pl.dslice(loc, 1)][0]
            ch_ref[W - 1] = jnp.where(idx < lbmax, cw,
                                      jnp.full((sub, LANE), -2,
                                               jnp.int32))
            return carry

        return row

    # rows whose entering column i + kband lies in [base, base + CH)
    # run in this chunk (i in [base - kband, base + CH - kband - 1]);
    # the last chunk also runs any tail rows (their loads clamp/mask)
    lo = jnp.maximum(base - kband, 1)
    hi = jnp.minimum(base + CH - kband - 1, la)
    hi = jnp.where(c == nchunks - 1, la, hi)
    hi_masked = jnp.minimum(hi, kband + 1)
    jax.lax.fori_loop(lo, hi_masked + 1, make_row(True), 0)
    jax.lax.fori_loop(jnp.maximum(lo, kband + 2), hi + 1,
                      make_row(False), 0)

    @pl.when(c == nchunks - 1)
    def _emit():
        res = bigs
        parf = la & 1
        for p in range(W):
            res = jnp.where(lb == la - kband + p, dp_ref[parf, p], res)
        out_ref[0] = res


@functools.partial(jax.jit,
                   static_argnames=("sub", "lbmax", "kband", "interpret"))
def _run_sqband_stream(q, la, b_cols, lb_t, *, sub=SEQ_SUB, lbmax=1024,
                       kband=7, interpret=False):
    """b_cols [nblocks * lbmax, sub, LANE] (seq layout, lbmax a
    DAM_BAND_CHUNK multiple) -> int32 [nblocks, sub, LANE] flattened."""
    W = 2 * kband + 1
    CH = DAM_BAND_CHUNK
    assert lbmax % CH == 0, (lbmax, CH)
    nchunks = lbmax // CH
    nblocks = b_cols.shape[0] // lbmax
    kern = functools.partial(_kernel_sqband_stream, sub=sub, lbmax=lbmax,
                             kband=kband, nchunks=nchunks)
    out = pl.pallas_call(
        kern,
        grid=(nblocks, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((CH, sub, LANE),
                         lambda i, j, nc=nchunks: (i * nc + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, W + 1, sub, LANE), jnp.int32),
                        pltpu.VMEM((W + 1, sub, LANE), jnp.int32),
                        pltpu.VMEM((W + 1, sub, LANE), jnp.int32),
                        pltpu.VMEM((W, sub, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, la, b_cols, lb_t)
    return jnp.reshape(out, (-1,)).astype(jnp.int32)


def prepare_corpus_seq_long(chars: np.ndarray, lens: np.ndarray,
                            sub: int = SEQ_SUB):
    """[B, 128 < LB <= MAX_TEXT_LONG] corpus -> seq-layout tiles for the
    streamed band kernel.  ``lbmax`` pads to a DAM_BAND_CHUNK multiple;
    ``B`` pads to a ``sub * 128`` multiple (pad rows: length 0)."""
    B, LB = chars.shape
    lbmax = -(-max(LB, DAM_BAND_CHUNK) // DAM_BAND_CHUNK) \
        * DAM_BAND_CHUNK
    Bp = -(-max(B, 1) // (sub * LANE)) * (sub * LANE)
    ch = np.full((Bp, lbmax), -2, np.int32)
    ch[:B, :LB] = np.where(chars < 0, -2, chars)
    ln = np.zeros(Bp, np.int32)
    ln[:B] = lens
    nb = Bp // (sub * LANE)
    b = ch.reshape(nb, sub, LANE, lbmax)
    b_cols = np.ascontiguousarray(
        b.transpose(0, 3, 1, 2).reshape(nb * lbmax, sub, LANE))
    lb_t = ln.reshape(nb, sub, LANE)
    return b_cols, np.ascontiguousarray(lb_t), lbmax


def damerau_seqband_long_1v_many(query, b_cols, lb_t, *, lbmax: int,
                                 kband: int, sub: int = SEQ_SUB,
                                 interpret: bool = False,
                                 staged=None) -> jnp.ndarray:
    """One-vs-many cutoff-banded Damerau for long buckets -> int32[B].

    Same exactness contract as :func:`damerau_seqband_1v_many` (exact
    wherever the true distance <= kband; > kband otherwise)."""
    if staged is not None:
        qj, laj, la = staged
    else:
        qpad, la = _encode_query_rows(query)
    if la == 0:
        return jnp.reshape(jnp.asarray(lb_t), (-1,)).astype(jnp.int32)
    if staged is None:
        qj, laj = jnp.asarray(qpad), jnp.array([la], jnp.int32)
    b_cols = jnp.asarray(b_cols)
    lb_t = jnp.asarray(lb_t)
    return _run_sqband_stream(qj, laj, b_cols, lb_t, sub=sub,
                              lbmax=lbmax, kband=kband,
                              interpret=interpret)


# ------------------------------------------------- long candidates (>128)

def _pack_params(nb: int):
    """(col_bits, PBIG, SENT) for the packed last-match scan: columns take
    ``col_bits`` low bits (jcol up to ``nb*128``), values the rest of an
    int32; SENT = PBIG << col_bits stays < 2^31."""
    col_bits = max(11, (nb * LANE).bit_length())
    pbig = 1 << (30 - col_bits)
    return col_bits, pbig, pbig << col_bits


def _kernel_long(q_ref, la_ref, b_ref, lb_ref, out_ref, d1_ref, d2_ref,
                 k_ref, fr_ref, *, sub: int, nb: int):
    """Zhao-Sahni rows over NB 128-lane column blocks per candidate.

    Same per-block math as :func:`_kernel` (seg == LANE), with the four
    row structures stored per block in VMEM scratch.  Cross-block chaining
    is REDUCTION-FREE: every loop-carried quantity (last-match packed
    value, min-plus running prefix, last one/two lanes of D_{i-1}/D_{i-2})
    is injected into lane 0 of the next block from a ``pltpu.roll`` of the
    previous block's vector — the Hillis-Steele scans then propagate it to
    every lane, so the five per-block masked lane reductions of the first
    version (~40% of row time at nb=16) disappear.  Extends the
    lane-column kernel to candidates up to ``nb * 128`` chars; O(N * M)
    like the reference (``damerau_levenshtein.rs:111-168``).
    """
    la = la_ref[0]
    local = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    # packed (value << col_bits | col) last-match scan; values are clamped
    # to PBIG before packing (the caller guards la + nb*128 < PBIG so real
    # scores never clamp)
    col_bits, pbig, sent = _pack_params(nb)
    PBIG = jnp.int32(pbig)
    SENT = jnp.int32(sent)
    CMASK = jnp.int32((1 << col_bits) - 1)
    shifts = [1, 2, 4, 8, 16, 32, 64]
    lb = lb_ref[:, :]                        # per-candidate length, bcast

    for b in range(nb):
        d1_ref[b] = jax.lax.broadcasted_iota(
            jnp.int32, (sub, LANE), 1) + b * LANE + 1   # D[0][j] = j
        d2_ref[b] = jnp.full((sub, LANE), BIG, jnp.int32)
        k_ref[b] = jnp.zeros((sub, LANE), jnp.int32)
        fr_ref[b] = jnp.full((sub, LANE), BIG, jnp.int32)

    def row(i, carry):
        ai = q_ref[i - 1]
        d2fill = jnp.where(i >= 2, i - 2, BIG)
        zeros = jnp.zeros((sub, LANE), jnp.int32)
        bigs = jnp.full((sub, LANE), BIG, jnp.int32)
        # carry vectors: only lane 0 (lanes 0-1 for v_m2) is ever read;
        # block 0 uses the row boundary values, block b > 0 a roll of
        # block b-1's vector whose low lane(s) are that block's last
        # lane(s)
        v_d2 = zeros + d2fill                # D_{i-2}[jcol-1] @ lane 0
        v_d1 = zeros + (i - 1)               # D_{i-1}[jcol-1] @ lane 0
        v_m2 = jnp.where(local == 1, zeros + (i - 1), bigs)  # D_{i-1}[jcol-2]
        v_e = jnp.full((sub, LANE), SENT, jnp.int32)
        v_y = bigs
        for b in range(nb):
            jcol = local + (b * LANE + 1)
            dim1 = d1_ref[b]
            dim2 = d2_ref[b]
            K = k_ref[b]
            FR = fr_ref[b]
            b_tile = b_ref[:, b * LANE:(b + 1) * LANE]
            eq_i = b_tile == ai

            r1_d2 = pltpu.roll(dim2, 1, 1)
            dim2_up = jnp.where(local >= 1, r1_d2, v_d2)
            d2p = jnp.minimum(dim2_up, PBIG)
            e = jnp.where(eq_i, (d2p << col_bits) | jcol, SENT)
            # inject the prior-block carry at lane 0; the scan spreads it
            e = jnp.where((local == 0) & ~eq_i, v_e, e)
            for sh in shifts:
                r = pltpu.roll(e, sh, 1)
                r = jnp.where(local >= sh, r, SENT)
                e = jnp.where((e & CMASK) > 0, e, r)
            r1_e = pltpu.roll(e, 1, 1)
            es = jnp.where(local >= 1, r1_e, v_e)  # last match < jcol
            L = es & CMASK
            t = jnp.where(L >= 1, es >> col_bits, BIG)

            r1_d1 = pltpu.roll(dim1, 1, 1)
            diag = jnp.where(local >= 1, r1_d1, v_d1)  # D_{i-1}[jcol-1]
            cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
            cand = jnp.minimum(diag + cost, dim1 + 1)
            case1 = jnp.where(jcol - L == 1, FR + (i - K), BIG)
            case2 = jnp.where((i - K == 1) & (jcol - L != 1),
                              t + (jcol - L), BIG)
            tr = jnp.minimum(case1, case2)
            cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))
            cand = jnp.minimum(cand, i + jcol)   # boundary D[i][0] = i

            y = cand - jcol
            y = jnp.where(local == 0, jnp.minimum(y, v_y), y)
            for sh in shifts:
                r = pltpu.roll(y, sh, 1)
                r = jnp.where(local >= sh, r, BIG)
                y = jnp.minimum(y, r)
            new = y + jcol

            # D_{i-1}[jcol-2]: two-lane cross-block shift
            r2 = pltpu.roll(dim1, 2, 1)
            dim1_m2 = jnp.where(local >= 2, r2, v_m2)

            fr_ref[b] = jnp.where(eq_i, dim1_m2, FR)
            k_ref[b] = jnp.maximum(K, jnp.where(eq_i, i, 0))
            d2_ref[b] = dim1
            d1_ref[b] = new

            # rolled carries for the next block (lane 0 = this block's
            # last lane; v_m2 lanes 0-1 = lanes 126-127)
            v_d2 = r1_d2
            v_d1 = r1_d1
            v_m2 = r2
            v_e = r1_e
            v_y = pltpu.roll(y, 1, 1)
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)
    acc = jnp.zeros((sub, LANE), jnp.int32)
    for b in range(nb):
        jcol = local + (b * LANE + 1)
        acc = acc + jnp.where(jcol == lb, d1_ref[b], 0)
    out_ref[:, :] = acc


def _kernel_long_stream(q_ref, la_ref, b_ref, lb_ref, out_ref, d1_ref,
                        d2_ref, k_ref, fr_ref, cr_ref, acc_ref, *,
                        sub: int, nb: int, unroll: int = 1):
    """:func:`_kernel_long` with the per-row block walk as a
    ``fori_loop`` instead of a Python unroll.

    Mosaic's stack temporaries scale with the unrolled block count: at
    nb=64 the unrolled body wants 20.95M scoped VMEM against the 16M
    core limit at sub=64, forcing half-height tiles past 48 blocks
    (evidence/damerau_long_8k_oom_r4.log) — and sub=64 is 1.46x sub=32
    (evidence/damerau_long_sub_probe_r4.log).  Here the block index is
    a loop variable: the four row structures are indexed dynamically on
    their leading axis, the candidate blocks arrive pre-transposed as
    ``(nb, sub, LANE)`` for dynamic leading-axis loads, and the five
    cross-block carries live in a small ``(5, sub, LANE)`` scratch
    (fori vector carries hit Mosaic's "Invalid relayout" on constant
    inits) — so compile-time temporaries no longer grow with nb and
    full-height tiles fit at any block count.
    """
    la = la_ref[0]
    local = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    col_bits, pbig, sent = _pack_params(nb)
    PBIG = jnp.int32(pbig)
    SENT = jnp.int32(sent)
    CMASK = jnp.int32((1 << col_bits) - 1)
    shifts = [1, 2, 4, 8, 16, 32, 64]
    lb = lb_ref[:, :]
    zeros0 = jnp.zeros((sub, LANE), jnp.int32)
    bigs0 = jnp.full((sub, LANE), BIG, jnp.int32)

    def init_b(b, carry):
        d1_ref[pl.dslice(b, 1)] = (local + (b * LANE + 1))[None]
        d2_ref[pl.dslice(b, 1)] = bigs0[None]
        k_ref[pl.dslice(b, 1)] = zeros0[None]
        fr_ref[pl.dslice(b, 1)] = bigs0[None]
        return carry

    jax.lax.fori_loop(0, nb, init_b, 0)

    def row(i, carry):
        ai = q_ref[i - 1]
        d2fill = jnp.where(i >= 2, i - 2, BIG)
        zeros = jnp.zeros((sub, LANE), jnp.int32)
        bigs = jnp.full((sub, LANE), BIG, jnp.int32)
        cr_ref[0] = zeros + d2fill               # v_d2 @ lane 0
        cr_ref[1] = zeros + (i - 1)              # v_d1 @ lane 0
        cr_ref[2] = jnp.where(local == 1, zeros + (i - 1), bigs)  # v_m2
        cr_ref[3] = jnp.full((sub, LANE), SENT, jnp.int32)        # v_e
        cr_ref[4] = bigs                                          # v_y

        def block_u(it, c2):
            for u in range(unroll):
                block(it * unroll + u)
            return c2

        def block(b):
            jcol = local + (b * LANE + 1)
            dim1 = d1_ref[pl.dslice(b, 1)][0]
            dim2 = d2_ref[pl.dslice(b, 1)][0]
            K = k_ref[pl.dslice(b, 1)][0]
            FR = fr_ref[pl.dslice(b, 1)][0]
            b_tile = b_ref[pl.dslice(b, 1)][0]
            eq_i = b_tile == ai
            v_d2 = cr_ref[0]
            v_d1 = cr_ref[1]
            v_m2 = cr_ref[2]
            v_e = cr_ref[3]
            v_y = cr_ref[4]

            r1_d2 = pltpu.roll(dim2, 1, 1)
            dim2_up = jnp.where(local >= 1, r1_d2, v_d2)
            d2p = jnp.minimum(dim2_up, PBIG)
            e = jnp.where(eq_i, (d2p << col_bits) | jcol, SENT)
            e = jnp.where((local == 0) & ~eq_i, v_e, e)
            for sh in shifts:
                r = pltpu.roll(e, sh, 1)
                r = jnp.where(local >= sh, r, SENT)
                e = jnp.where((e & CMASK) > 0, e, r)
            r1_e = pltpu.roll(e, 1, 1)
            es = jnp.where(local >= 1, r1_e, v_e)
            L = es & CMASK
            t = jnp.where(L >= 1, es >> col_bits, BIG)

            r1_d1 = pltpu.roll(dim1, 1, 1)
            diag = jnp.where(local >= 1, r1_d1, v_d1)
            cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
            cand = jnp.minimum(diag + cost, dim1 + 1)
            case1 = jnp.where(jcol - L == 1, FR + (i - K), BIG)
            case2 = jnp.where((i - K == 1) & (jcol - L != 1),
                              t + (jcol - L), BIG)
            tr = jnp.minimum(case1, case2)
            cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))
            cand = jnp.minimum(cand, i + jcol)

            y = cand - jcol
            y = jnp.where(local == 0, jnp.minimum(y, v_y), y)
            for sh in shifts:
                r = pltpu.roll(y, sh, 1)
                r = jnp.where(local >= sh, r, BIG)
                y = jnp.minimum(y, r)
            new = y + jcol

            r2 = pltpu.roll(dim1, 2, 1)
            dim1_m2 = jnp.where(local >= 2, r2, v_m2)

            fr_ref[pl.dslice(b, 1)] = jnp.where(eq_i, dim1_m2, FR)[None]
            k_ref[pl.dslice(b, 1)] = jnp.maximum(
                K, jnp.where(eq_i, i, 0))[None]
            d2_ref[pl.dslice(b, 1)] = dim1[None]
            d1_ref[pl.dslice(b, 1)] = new[None]

            cr_ref[0] = r1_d2
            cr_ref[1] = r1_d1
            cr_ref[2] = r2
            cr_ref[3] = r1_e
            cr_ref[4] = pltpu.roll(y, 1, 1)

        # hybrid unroll: `unroll` blocks statically inside each fori
        # trip — compile-time temporaries scale with `unroll` (<= 16,
        # well under the 47-block unroll that fits at sub=64) while the
        # per-trip bookkeeping amortizes across blocks
        jax.lax.fori_loop(0, nb // unroll, block_u, 0)
        return carry

    jax.lax.fori_loop(1, la + 1, row, 0)

    acc_ref[:, :] = jnp.zeros((sub, LANE), jnp.int32)

    def fin(b, carry):
        jcol = local + (b * LANE + 1)
        acc_ref[:, :] = acc_ref[:, :] + jnp.where(
            jcol == lb, d1_ref[pl.dslice(b, 1)][0], 0)
        return carry

    jax.lax.fori_loop(0, nb, fin, 0)
    out_ref[:, :] = acc_ref[:, :]


def _pick_stream_unroll(nb: int) -> int:
    """Blocks statically unrolled per fori trip: measured at nb=64/
    sub=64 on v5e, u=1 -> 1153 pairs/s, u=8 -> 1701, u=16 -> 1766,
    u=32 -> 1819 (evidence/damerau_long_stream_r5{b,c}.log) — the
    per-trip bookkeeping dominates the un-unrolled form; 32 blocks at
    sub=64 still compiles (47 did in the fully-unrolled kernel)."""
    for u in (32, 16, 8, 4, 2):
        if nb % u == 0:
            return u
    return 1


@functools.partial(jax.jit,
                   static_argnames=("sub", "nb", "unroll",
                                    "pre_transposed", "interpret"))
def _run_long_stream(q, la, b_tiles, lb_tiles, *, sub, nb, unroll=None,
                     pre_transposed=False, interpret=False):
    """Streamed-block long kernel: candidates pre-transposed to
    ``(nb, rows, LANE)`` for dynamic leading-axis block loads.  With
    ``pre_transposed`` the caller supplies the ``(nb, rows, LANE)``
    layout directly (staged once per corpus) — otherwise the transpose
    fuses into this jitted program and costs a corpus-sized HBM
    read+write per scan."""
    if pre_transposed:
        rows = b_tiles.shape[1]
        b3 = b_tiles
    else:
        rows = b_tiles.shape[0]
        b3 = jnp.transpose(
            jnp.reshape(b_tiles, (rows, nb, LANE)), (1, 0, 2))
    nblocks = rows // sub
    if unroll is None:
        unroll = _pick_stream_unroll(nb)
    kern = functools.partial(_kernel_long_stream, sub=sub, nb=nb,
                             unroll=unroll)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nb, sub, LANE), jnp.int32)
                        for _ in range(4)]
        + [pltpu.VMEM((5, sub, LANE), jnp.int32),
           pltpu.VMEM((sub, LANE), jnp.int32)],
        interpret=interpret,
    )(q, la, b3, lb_tiles)


@functools.partial(jax.jit, static_argnames=("sub", "nb", "interpret"))
def _run_long(q, la, b_tiles, lb_tiles, *, sub, nb, interpret=False):
    nblocks = b_tiles.shape[0] // sub
    kern = functools.partial(_kernel_long, sub=sub, nb=nb)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sub, nb * LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_tiles.shape[0], LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nb, sub, LANE), jnp.int32)
                        for _ in range(4)],
        interpret=interpret,
    )(q, la, b_tiles, lb_tiles)


MAX_TEXT_LONG = 8192   # NB * sub scratch budget (sub shrinks as NB grows
                       # to hold the 4 row structures within ~8 MB VMEM;
                       # past 48 blocks Mosaic's unroll-scaled stack
                       # temporaries force sub * nb <= 2048, so nb=64
                       # runs at sub=32 — see the rule in
                       # prepare_corpus_long and
                       # evidence/damerau_long_8k_oom_r4.log)


def pick_sub_long(rows: int, nb: int) -> int:
    """Tile height for the long kernel's (sub, nb) scratch layout.

    sub * nb == 4096 puts the 4 row structures at 8 MB VMEM — fits v5e
    next to the candidate tile, and the full-height sub=128 is 1.46x
    sub=64 at nb=32 (evidence/damerau_long_sub_probe_r4.log: 147 vs
    217 us/pair, 3.4x the XLA path at 4096 chars).  Mosaic's stack
    temporaries also grow with the nb-block unroll: nb=64 at sub=64
    needs 20.95M scoped VMEM vs the 16M core limit while nb=47 at
    sub=64 fits (evidence/damerau_long_8k_oom_r4.log), so from 48
    blocks on the tile height halves again (nb=48 at sub=64 is within
    ~0.3M of the 16M limit and was never hardware-verified — treated
    as over, per ADVICE r4).  MULTI-grid-block runs (rows > sub) cap at
    sub * nb <= 2048 regardless: with >1 grid step the double-buffered
    candidate tiles join the scoped-vmem accounting and a sub=128/nb=32
    run that fit single-block OOMs by 2.07M
    (evidence/damerau_band_long_rate_r5.log tail, r5).
    """
    sub = pick_sub(rows)
    while (sub * nb > 4096 or (nb >= 48 and sub * nb > 2048)
           or (rows > sub and sub * nb > 2048)) and sub > 8:
        sub //= 2
    return sub


def prepare_corpus_long(chars: np.ndarray, lens: np.ndarray,
                        sub: int | None = None):
    """[B, 128<LB<=MAX_TEXT_LONG] i32 corpus -> full-lane-row tiles for
    the long Damerau kernel.  Candidate ``c`` occupies row ``c``; char
    ``j`` (1-based) at flat lane ``j - 1``; padding holds -2.  ``B`` must
    be a multiple of ``sub``.  Returns ``(b_tiles [B, NB*128],
    lb_tiles [B, 128], nb, sub)``."""
    B, LB = chars.shape
    if LB > MAX_TEXT_LONG:
        raise ValueError(f"candidates longer than {MAX_TEXT_LONG} need "
                         "the XLA Damerau path")
    nb = max(1, -(-LB // LANE))
    if sub is None:
        sub = pick_sub_long(B, nb)
    b = np.full((B, nb * LANE), -2, np.int32)
    b[:, :LB] = np.where(chars < 0, -2, chars)
    lbt = np.broadcast_to(lens.astype(np.int32).reshape(B, 1),
                          (B, LANE)).copy()
    return b, lbt, nb, sub


def transpose_corpus_long(b_tiles, nb: int):
    """[rows, nb*LANE] row tiles -> (nb, rows, LANE) block-major layout
    for the streamed-block kernel; stage once per corpus and pass as
    ``b3`` to skip the per-scan transpose."""
    b_tiles = jnp.asarray(b_tiles)
    rows = b_tiles.shape[0]
    return jnp.transpose(
        jnp.reshape(b_tiles, (rows, nb, LANE)), (1, 0, 2))


def damerau_long_1v_many(query: np.ndarray, b_tiles, lb_tiles, *, nb: int,
                         sub: int, interpret: bool = False,
                         mesh=None, b3=None) -> jnp.ndarray:
    """One-vs-many unrestricted Damerau for 128 < candidates <=
    ``MAX_TEXT_LONG`` (8192) chars -> int32[B].  With a multi-device ``mesh``, per-shard via
    ``shard_map`` (``sub`` must divide the per-shard row count)."""
    lens = jnp.asarray(lb_tiles)[:, 0]     # stays on device (no transfer)
    qpad, la = _encode_query_rows(query)
    if la == 0:
        return lens.astype(jnp.int32)
    if la + nb * LANE >= _pack_params(nb)[1]:
        # scores could reach the packed-scan clamp (PBIG); such extreme
        # query lengths take the XLA path instead
        raise ValueError("query too long for the packed-scan value range")
    ndev = len(mesh.devices.flat) if mesh is not None else 1
    # past 48 blocks the unrolled kernel only fits half-height tiles
    # (Mosaic stack temporaries scale with the block unroll) — the
    # streamed-block form keeps full height at any nb.  ``b3`` (from
    # :func:`transpose_corpus_long`, cached by the scanner) skips the
    # per-scan corpus transpose on the single-device path.
    run, s_eff = _run_long, sub
    if nb > 48:
        run = _run_long_stream
        s_eff = pick_sub(int(b_tiles.shape[0] if b3 is None
                             else b3.shape[1]) // ndev)
        while s_eff * nb > 4096 and s_eff > 8:     # 4-structure 8 MB cap
            s_eff //= 2
    if ndev > 1:
        rows = int(b_tiles.shape[0]) // ndev
        s_loc = s_eff
        while s_loc > 8 and rows % s_loc:
            s_loc //= 2
        f = _sharded(run, mesh,
                     dict(sub=s_loc, nb=nb, interpret=interpret))
        out = f(jnp.asarray(qpad), jnp.array([la], jnp.int32), b_tiles,
                lb_tiles)
    elif nb > 48 and b3 is not None:
        out = _run_long_stream(jnp.asarray(qpad),
                               jnp.array([la], jnp.int32), b3,
                               jnp.asarray(lb_tiles), sub=s_eff, nb=nb,
                               pre_transposed=True, interpret=interpret)
    else:
        out = run(jnp.asarray(qpad), jnp.array([la], jnp.int32),
                  jnp.asarray(b_tiles), jnp.asarray(lb_tiles),
                  sub=s_eff, nb=nb, interpret=interpret)
    summed = jnp.sum(out, axis=1)
    return jnp.where(lens == 0, la, summed)
