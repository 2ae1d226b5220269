"""Pallas TPU kernel: one-vs-many LCS length (Hyyrö bit-parallel).

Same tiling/table design as :mod:`lev_kernel` (4096 candidates per grid
cell, dynamic-gather PM tables, 16x unrolled text loop); the recurrence is
the reference's ``lcs_unroll`` inner loop
(``/root/reference/src/distance/lcs_seq.rs:225-235``): per word
``u = s & pm; s = (s + u + carry) | (s - u)`` with the add carry chained
across u32 words (``carrying_add``, ``intrinsics.rs:25-29``).  Result =
popcount of zero bits; bits above the pattern length stay 1 so no mask is
needed, which also makes the kernel independent of the query length
(compilations keyed on (W, LB, ntab) only).

Serves lcs_seq, indel (``dist = la + lb - 2*lcs``) and fuzz.ratio scans —
roughly half the per-step op count of the Levenshtein kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lev_kernel import LANE, SUB, build_pm_tables, pick_unroll, unpack_byte


def _kernel(tab_ref, cand_ref, lb_ref, out_ref, *, LB: int, W: int,
            ntab: int, unroll: int, sub: int, multiq: bool = False):
    lb = lb_ref[:, :]
    ones = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)

    def one_char(row, u, j, s, masked):
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
            # carrying_add (intrinsics.rs:25-29) specialized per position:
            # word 0 has no carry-in, the last word's carry-out is unused
            x1 = sw + um
            x2 = x1 if carry is None else x1 + carry
            if w != W - 1:
                c1 = (x1 < sw).astype(jnp.uint32)
                carry = c1 if carry is None else c1 | (x2 < x1).astype(
                    jnp.uint32)
            new_s.append(x2 | (sw - um))
        if masked:
            # the s-state IS the result accumulator, so chars past a
            # candidate's length must not update it
            active = j < lb
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
                s = one_char(row, u, jj * unroll + u, s, masked)
            return tuple(s)
        return body

    # phase split: while j < min(lb) every candidate is active, so the
    # hot loop needs no per-char masking; the ragged tail is masked
    full_trips = jnp.min(lb) // unroll
    trips = (jnp.max(lb) + (unroll - 1)) // unroll
    state = lax.fori_loop(0, full_trips, make_body(False), (ones,) * W)
    state = lax.fori_loop(full_trips, trips, make_body(True), state)
    sim = jnp.zeros((sub, LANE), jnp.int32)
    for w in range(W):
        sim = sim + lax.population_count(~state[w]).astype(jnp.int32)
    if multiq:
        out_ref[0] = sim
    else:
        out_ref[:, :] = sim


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _run(tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
         interpret=False):
    assert unroll % 4 == 0, "packed-row indexing needs unroll % 4 == 0"
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, ntab=ntab, unroll=unroll,
                             sub=sub)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
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
    )(tabs, cand3, lb2)


# ------------------------------------------------------------ multi-query

@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "unroll", "sub",
                                    "interpret"))
def _run_nq(tabs, cand3, lb2, *, LB, W, ntab, unroll, sub=SUB,
            interpret=False):
    """NQ queries' LCS lengths in one dispatch (grid ``(nblocks, q)``
    with the query axis innermost so consecutive grid steps share each
    corpus tile fetch — the lev kernel's ``_run_nq`` pattern).  The LCS
    body never reads the query length, so no per-query scalars are
    needed; ``tabs`` stacks the NQ PM tables along axis 0."""
    NQ = tabs.shape[0] // (W * ntab)
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, ntab=ntab, unroll=unroll,
                             sub=sub, multiq=True)
    return pl.pallas_call(
        kern,
        grid=(nblocks, NQ),
        in_specs=[
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
    )(tabs, cand3, lb2)


def lcs_nq_many(queries, cand3, lb2, *, mode: str = "byte", staged=None,
                interpret: bool = False) -> jnp.ndarray:
    """Many-vs-many LCS lengths -> [NQ, B/128, 128] i32.

    All queries must share one word bucket (equal ``ceil(len/32)``);
    callers bucket by W (``CorpusScanner._distances_many``).  Empty
    queries need no special case: their PM tables are all-zero, so the
    state never changes and the popcount stays 0.
    """
    qs = [np.asarray(q) for q in queries]
    Ws = {max(1, -(-q.size // 32)) for q in qs}
    if len(Ws) != 1:
        raise ValueError(f"queries span word buckets {sorted(Ws)}")
    W = Ws.pop()
    LB = int(cand3.shape[0]) * 4
    ntab = 2 if mode == "byte" else 1
    tabs = (staged if staged is not None
            else jnp.asarray(np.concatenate(
                [build_pm_tables(q, mode) for q in qs], axis=0)))
    return _run_nq(tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                   unroll=pick_unroll(LB), interpret=interpret)


def lcs_1v_many(query: np.ndarray, cand3, lb2, *, mode: str = "byte",
                staged=None, interpret: bool = False) -> jnp.ndarray:
    """One-vs-many LCS lengths -> [B/128, 128] i32."""
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        return jnp.zeros(lb2.shape, jnp.int32)
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    tabs = (staged[1] if staged is not None
            else jnp.asarray(build_pm_tables(q, mode)))
    return _run(tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                unroll=pick_unroll(LB), interpret=interpret)
