"""Pallas TPU kernel: one-vs-many unrestricted Damerau-Levenshtein.

Zhao-Sahni semantics (``/root/reference/src/distance/damerau_levenshtein.rs
:111-168``) in a lane-transposed layout: **DP columns live on the lane
axis** (text position ``j`` at lane ``j``, so candidates are limited to
127 chars) and 32 candidates share a tile on the sublane axis.  This
orientation makes every per-row structure a plain vector op:

* the within-row last-match propagation (``l`` and ``D[i-2][l-1]``) and
  the left-neighbour min-plus recurrence are 7-step Hillis-Steele scans
  over lanes (``jnp.roll`` + mask — the per-element gathers that
  scalarise in the XLA formulation never appear);
* the last-row structure ``K[j]`` is an elementwise running max;
* the query walks one char per ``fori_loop`` row step (SMEM scalar
  reads), so trips == the true query length.

Measured ~0.4M pairs/s for len-64 on v5e — vs ~0.07-0.27M for the XLA
scan and ~0.02M for reference-class CPU code.  O(N·M) like the reference;
use the bit-parallel kernels for metrics that admit them.  First compile
of the kernel is slow through the remote tunnel (~5 min; cached after).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBC = 32          # candidates per tile (sublane axis)
BIG = np.int32(1 << 28)
MAX_TEXT = LANE - 1


def _kernel(q_ref, la_ref, b_ref, lb_ref, out_ref, st_ref, *, sub: int):
    la = la_ref[0]
    b_tile = b_ref[:, :]                     # [sub, 128] candidate chars
    lb = lb_ref[:, :]                        # [sub, 128] lengths (bcast)
    jj = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)

    def shift_up(x, sh, fill):
        r = pltpu.roll(x, sh, 1)
        return jnp.where(jj >= sh, r, fill)

    def last_match_scan(pos, val):
        """Inclusive scan: at lane j, the highest lane <= j with pos>0
        (and its val) — Hillis-Steele over lanes."""
        for sh in (1, 2, 4, 8, 16, 32, 64):
            p2 = shift_up(pos, sh, 0)
            v2 = shift_up(val, sh, BIG)
            keep = pos > 0
            pos = jnp.where(keep, pos, p2)
            val = jnp.where(keep, val, v2)
        return pos, val

    def minplus_prefix(x):
        """new[j] = min over k<=j of (x[k] + (j-k))  (lane prefix)."""
        y = x - jj
        for sh in (1, 2, 4, 8, 16, 32, 64):
            y = jnp.minimum(y, shift_up(y, sh, BIG))
        return y + jj

    # carries live in VMEM scratch (not fori_loop carries): iota/constant
    # inits otherwise enter the loop sublane-replicated and Mosaic cannot
    # relayout the carry ("Invalid relayout" at the while boundary)
    st_ref[0] = jj                           # D_{i-1}; D[0][j] = j
    st_ref[1] = jnp.full((sub, LANE), BIG, jnp.int32)    # D_{i-2}
    st_ref[2] = jnp.zeros((sub, LANE), jnp.int32)        # K[j]
    st_ref[3] = jnp.full((sub, LANE), BIG, jnp.int32)    # FR[j]

    def step(i, carry):
        dim1 = st_ref[0]
        dim2 = st_ref[1]
        K = st_ref[2]
        FR = st_ref[3]
        ai = q_ref[i - 1]
        eq_i = b_tile == ai                  # lane 0 / pads hold -2

        # (L, t) = last matching col < j and D_{i-2}[l-1]
        dim2_up = shift_up(dim2, 1, BIG)
        pos0 = jnp.where(eq_i, jj, 0)
        val0 = jnp.where(eq_i, dim2_up, BIG)
        spos, sval = last_match_scan(pos0, val0)
        L = shift_up(spos, 1, 0)
        t = shift_up(sval, 1, BIG)
        t = jnp.where(L >= 1, t, BIG)

        diag = shift_up(dim1, 1, BIG)
        cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
        cand = jnp.minimum(diag + cost, dim1 + 1)

        case1 = jnp.where(jj - L == 1, FR + (i - K), BIG)
        case2 = jnp.where((i - K == 1) & (jj - L != 1), t + (jj - L), BIG)
        tr = jnp.minimum(case1, case2)
        cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))
        cand = jnp.where(jj == 0, i, cand)   # new[0] = i

        new = minplus_prefix(cand)

        dim1_m2 = shift_up(dim1, 2, BIG)
        st_ref[3] = jnp.where(eq_i, dim1_m2, FR)
        st_ref[2] = jnp.maximum(K, jnp.where(eq_i, i, 0))
        st_ref[1] = dim1
        st_ref[0] = new
        return carry

    jax.lax.fori_loop(1, la + 1, step, 0)
    out_ref[:, :] = jnp.where(jj == lb, st_ref[0], 0)


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def _run(q, la, b_tiles, lb_tiles, *, sub=SUBC, interpret=False):
    nblocks = b_tiles.shape[0] // sub
    kern = functools.partial(_kernel, sub=sub)
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


def prepare_corpus_cols(chars: np.ndarray, lens: np.ndarray, sub: int = SUBC):
    """[B, LB<=127] i32 corpus -> column-lane tiles for the Damerau kernel.

    Returns ``(b_tiles [B, 128], lb_tiles [B, 128])`` with candidate char
    ``j`` (1-based) at lane ``j``; lane 0 and padding hold -2 (never
    matches); ``B`` must be a multiple of ``sub``.
    """
    B, LB = chars.shape
    if LB > MAX_TEXT:
        raise ValueError(f"candidates longer than {MAX_TEXT} need the XLA "
                         "Damerau path")
    b = np.full((B, LANE), -2, np.int32)
    b[:, 1:LB + 1] = np.where(chars < 0, -2, chars)
    lbt = np.broadcast_to(lens.astype(np.int32)[:, None], (B, LANE)).copy()
    return b, lbt


def damerau_1v_many(query: np.ndarray, b_tiles, lb_tiles, *,
                    interpret: bool = False) -> jnp.ndarray:
    """One-vs-many unrestricted Damerau distances -> int32[B].

    ``b_tiles``/``lb_tiles`` from :func:`prepare_corpus_cols`; the query
    may be any length (row loop runs exactly ``len(query)`` steps).
    """
    q = np.asarray(query, np.int64)
    la = int(q.size)
    lens = np.asarray(lb_tiles)[:, 0]
    if la == 0:
        return jnp.asarray(lens.astype(np.int32))
    if q.max(initial=0) > np.iinfo(np.int32).max or q.min(initial=0) < -1:
        # out-of-domain query chars can never match (host sentinel)
        q = np.where((q < 0) | (q > np.iinfo(np.int32).max), -3, q)
    # pad the query to a 32-multiple so compilations are keyed per bucket;
    # the row loop stops at the true length
    LQ = -(-la // 32) * 32
    qpad = np.full(LQ, -3, np.int32)
    qpad[:la] = q.astype(np.int32)
    out = _run(jnp.asarray(qpad), jnp.array([la], jnp.int32),
               jnp.asarray(b_tiles), jnp.asarray(lb_tiles),
               interpret=interpret)
    return jnp.sum(out, axis=1)
