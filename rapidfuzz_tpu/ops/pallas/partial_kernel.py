"""Pallas TPU kernel: one-vs-many ``fuzz.partial_ratio`` (windowed LCS).

``partial_ratio`` slides the query over every clipped window of each
candidate (windows ``cand[max(0, i-m) : min(n, i)]`` for ``i`` in
``1..n+m-1``, query length m, candidate length n) and keeps the best
indel ratio ``2*lcs / (m + wlen)``.  The ecosystem (rapidfuzz-cpp/-py;
absent from the reference crate, ``fuzz.rs:207-213``) computes each
window as an independent LCS; this kernel keeps the whole window sweep
on device:

* window starts are processed FOUR at a time so the four running LCS
  states share each char's packed-row load and its PM-table gathers
  (the gather is the expensive step: sharing it makes the per-window
  char cost comparable to the plain LCS kernel's per-char cost);
* prefix windows (``[0, e)`` for ``e < m``) fold into one incremental
  pre-pass — they are the running states of a single left-anchored
  scan;
* the best window is tracked exactly as an integer fraction
  ``(num, den) = (2*lcs, m + wlen)`` compared by cross-multiplication;
  the host converts to f64 once per candidate, so scores match the
  host reference path bit-for-bit.

Only candidates with ``n >= m`` follow these window semantics (the
ecosystem swaps roles when the candidate is shorter, sliding IT over
the query); the fuzz driver re-scores the ``n < m`` stragglers on the
host path.

Compilations are keyed on ``(W, LB, ntab)`` only: the true query
length ``m`` arrives as a dynamic SMEM scalar (like the lev kernel's
``la``), so every query length in a word class shares one compile; the
flat TPU body pads the window span to ``M = 32*W`` chars and masks the
tail.  Interpret mode (tests) uses fori char loops instead — flat
bodies beyond ~56 steps blow up exponentially in the XLA-CPU
interpreter.

The default hardware route is the QUANTIZED-STATIC body (``_kernel_q``):
the window span rounds up to ``M8 = ceil(m/8)*8`` as a *static* compile
key (≤8 compiles per word class, persisted by the JIT disk cache), which
removes the dominant per-window ALU overhead of the dynamic body:

* window-active ranges ``p in [w, w+M8)`` become Python-static, so
  inactive windows cost zero ops instead of a masked no-op;
* the candidate-end mask folds into the PM word — ``u = s & 0`` makes
  the Hyyrö step ``s' = (s+u)|(s-u) = s`` an exact identity — so the
  per-word ``jnp.where`` freeze select disappears;
* only the last ``8 - m%8`` steps of each window carry a dynamic mask
  (none when ``m % 8 == 0``);
* eight window starts share each gather trip instead of four.

Per the op-count model this is ~2x fewer VPU ops per window-char than
the dynamic body (hardware numbers in experiments/evidence/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lev_kernel import LANE, SUB, build_pm_tables, unpack_byte


def _kernel(la_ref, tab_ref, cand_ref, lb_ref, num_ref, den_ref,
            st_ref, en_ref, *, LB: int, W: int, ntab: int, sub: int,
            flat: bool):
    m = la_ref[0]
    lb = lb_ref[:, :]
    M = 32 * W
    ones = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)

    def gather_pm(c):
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None
        pms = []
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pms.append(jnp.where(chi, t1, t0))
            else:
                pms.append(t0)
        return pms

    def lcs_step(s, pms):
        # lcs_seq.rs:225-235: u = s & pm; s = (s + u w/ carry) | (s - u)
        carry = None
        new = []
        for w in range(W):
            sw = s[w]
            um = sw & pms[w]
            x1 = sw + um
            x2 = x1 if carry is None else x1 + carry
            if w != W - 1:
                c1 = (x1 < sw).astype(jnp.uint32)
                carry = c1 if carry is None else c1 | (x2 < x1).astype(
                    jnp.uint32)
            new.append(x2 | (sw - um))
        return new

    def popc2(s):
        t = jnp.zeros((sub, LANE), jnp.int32)
        for w in range(W):
            t = t + lax.population_count(~s[w]).astype(jnp.int32)
        return 2 * t

    def better(num, den, st, en, best):
        """Strict improvement keeps the FIRST best window; windows are
        enumerated in the host path's order (prefix ends ascending, then
        starts ascending), so tie-breaks match it exactly."""
        bn, bd, bs, be = best
        upd = num * bd > bn * den
        return (jnp.where(upd, num, bn), jnp.where(upd, den, bd),
                jnp.where(upd, st, bs), jnp.where(upd, en, be))

    def dyn_char(p, base_row):
        """Char at dynamic in-group offset ``p`` (fori variants).  Rows
        past the corpus block are clamped: windows near the tail read up
        to M-1 chars beyond LB, every such lane is masked by ``< lb``
        before any state update, so the clamped row's value is dead."""
        row = cand_ref[jnp.minimum(base_row + p // 4, LB // 4 - 1)]
        sh = (8 * (p % 4)).astype(jnp.uint32)
        return ((row >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)

    # best = (num, den, start, end); num starts at -1 so the FIRST
    # enumerated window always wins (the host path's best = -1.0 init),
    # keeping tie-break positions identical even for all-zero scores
    zeros_i = jnp.zeros((sub, LANE), jnp.int32)
    best0 = (jnp.full((sub, LANE), -1, jnp.int32),
             jnp.ones((sub, LANE), jnp.int32), zeros_i, zeros_i)

    # ---- prefix windows [0, e) for e = 1..m-1: one incremental scan,
    # popcounting the running state at every step
    if flat:
        best = best0
        s = [ones] * W
        row = None
        for p in range(M - 1):
            if p % 4 == 0:
                row = cand_ref[min(p // 4, LB // 4 - 1)]
            pms = gather_pm(unpack_byte(row, p))
            ns = lcs_step(s, pms)
            s = [jnp.where(p < lb, a, b) for a, b in zip(ns, s)]
            en = jnp.minimum(p + 1, lb)
            num = popc2(s)
            den = m + en
            upd = (num * best[1] > best[0] * den) & (p + 1 < m)
            best = tuple(jnp.where(upd, v, b) for v, b in
                         zip((num, den, zeros_i, en), best))
    else:
        def pbody(p, carry):
            best = carry[:4]
            s = list(carry[4:])
            pms = gather_pm(dyn_char(p, 0))
            ns = lcs_step(s, pms)
            s = [jnp.where(p < lb, a, b) for a, b in zip(ns, s)]
            en = jnp.minimum(p + 1, lb)
            best = better(popc2(s), m + en, zeros_i, en, best)
            return (*best, *s)

        out = lax.fori_loop(0, m - 1, pbody, best0 + (ones,) * W)
        best = out[:4]

    # ---- all other windows [st, min(st + m, lb)), st = 0..lb-1,
    # processed four starts per trip so loads and gathers are shared
    def group(g, carry):
        best = carry
        base = g * 4
        s4 = [[ones] * W for _ in range(4)]
        if flat:
            row = None
            for p in range(M + 3):
                if p % 4 == 0:
                    row = cand_ref[jnp.minimum(g + p // 4, LB // 4 - 1)]
                pms = gather_pm(unpack_byte(row, p))
                act_t = (base + p) < lb
                for w in range(4):
                    if p >= w:
                        mask = act_t & ((p - w) < m)
                        ns = lcs_step(s4[w], pms)
                        s4[w] = [jnp.where(mask, a, b)
                                 for a, b in zip(ns, s4[w])]
        else:
            def cbody(p, state):
                # state is a flat tuple of 4*W tiles
                s = [list(state[w * W:(w + 1) * W]) for w in range(4)]
                pms = gather_pm(dyn_char(p, g))
                act_t = (base + p) < lb
                for w in range(4):
                    mask = act_t & (p >= w) & ((p - w) < m)
                    ns = lcs_step(s[w], pms)
                    s[w] = [jnp.where(mask, a, b)
                            for a, b in zip(ns, s[w])]
                return tuple(x for sw in s for x in sw)

            state = lax.fori_loop(0, m + 3, cbody,
                                  tuple(x for sw in s4 for x in sw))
            s4 = [list(state[w * W:(w + 1) * W]) for w in range(4)]
        for w in range(4):
            st = base + w
            wlen = jnp.clip(lb - st, 0, m)
            # invalid windows (st >= lb): num == 0 and den > 0, which
            # never beats a best >= 0 and the lb == 0 case is clamped at
            # emit, so they cannot take the position slots
            best = better(popc2(s4[w]), m + wlen, zeros_i + st,
                          st + wlen, best)
        return best

    gmax = (jnp.max(lb) + 3) // 4
    best = lax.fori_loop(0, gmax, group, best)
    bn, bd, bs, be = best
    valid = bn >= 0              # lb == 0: no window ever evaluated
    num_ref[:, :] = jnp.where(valid, bn, 0)
    den_ref[:, :] = jnp.where(valid, bd, 1)
    st_ref[:, :] = jnp.where(valid, bs, 0)
    en_ref[:, :] = jnp.where(valid, be, 0)


def _kernel_q(la_ref, tab_ref, cand_ref, lb_ref, num_ref, den_ref,
              st_ref, en_ref, *, LB: int, W: int, ntab: int, sub: int,
              M8: int, exact: bool, G: int):
    """Quantized-static flat body (hardware default; see module doc).

    ``M8`` is the window span rounded up to a multiple of 8 (static);
    ``exact`` means ``m == M8`` so no dynamic tail mask is needed;
    ``G`` window starts advance per char trip (must be a multiple of 4:
    packed rows hold 4 chars).
    """
    m = la_ref[0]
    lb = lb_ref[:, :]
    ones = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros_u = jnp.zeros((sub, LANE), jnp.uint32)
    zeros_i = jnp.zeros((sub, LANE), jnp.int32)

    def gather_pm(c):
        if ntab == 2:
            clo = jnp.where(c < LANE, c, c - LANE)
            chi = c >= LANE
        else:
            clo = c
            chi = None
        pms = []
        for w in range(W):
            t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
            if ntab == 2:
                t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo, axis=1)
                pms.append(jnp.where(chi, t1, t0))
            else:
                pms.append(t0)
        return pms

    def lcs_step(s, pms):
        carry = None
        new = []
        for w in range(W):
            sw = s[w]
            um = sw & pms[w]
            x1 = sw + um
            x2 = x1 if carry is None else x1 + carry
            if w != W - 1:
                c1 = (x1 < sw).astype(jnp.uint32)
                carry = c1 if carry is None else c1 | (x2 < x1).astype(
                    jnp.uint32)
            new.append(x2 | (sw - um))
        return new

    def popc2(s):
        t = jnp.zeros((sub, LANE), jnp.int32)
        for w in range(W):
            t = t + lax.population_count(~s[w]).astype(jnp.int32)
        return 2 * t

    def better(num, den, st, en, best):
        bn, bd, bs, be = best
        upd = num * bd > bn * den
        return (jnp.where(upd, num, bn), jnp.where(upd, den, bd),
                jnp.where(upd, st, bs), jnp.where(upd, en, be))

    best0 = (jnp.full((sub, LANE), -1, jnp.int32),
             jnp.ones((sub, LANE), jnp.int32), zeros_i, zeros_i)

    # ---- prefix windows [0, e), e = 1..m-1 (dynamic upd mask keeps the
    # e < m contract; states past lb freeze via the masked-PM identity)
    best = best0
    s = [ones] * W
    row = None
    for p in range(M8 - 1):
        if p % 4 == 0:
            row = cand_ref[min(p // 4, LB // 4 - 1)]
        act = jnp.where(p < lb, ~zeros_u, zeros_u)
        pms = [pm & act for pm in gather_pm(unpack_byte(row, p))]
        s = lcs_step(s, pms)
        en = jnp.minimum(p + 1, lb)
        num = popc2(s)
        den = m + en
        upd = (num * best[1] > best[0] * den) & (p + 1 < m)
        best = tuple(jnp.where(upd, v, b) for v, b in
                     zip((num, den, zeros_i, en), best))

    # ---- windows [st, min(st+m, lb)), st = 0..lb-1, G starts per trip;
    # window w is active only for p in [w, w+M8) (static range), with a
    # dynamic mask on the last 8 offsets when m < M8
    def group(g, carry):
        best = carry
        base = g * G
        s4 = [[ones] * W for _ in range(G)]
        row = None
        for p in range(M8 + G - 1):
            if p % 4 == 0:
                row = cand_ref[jnp.minimum(g * (G // 4) + p // 4,
                                           LB // 4 - 1)]
            act = jnp.where((base + p) < lb, ~zeros_u, zeros_u)
            pms = [pm & act for pm in gather_pm(unpack_byte(row, p))]
            for w in range(G):
                o = p - w
                if o < 0 or o >= M8:
                    continue
                if exact or o < M8 - 8:
                    s4[w] = lcs_step(s4[w], pms)
                else:
                    # tail offset that may lie past the true window end:
                    # zero the PM (identity step) when o >= m
                    pmw = [jnp.where(o < m, pm, zeros_u) for pm in pms]
                    s4[w] = lcs_step(s4[w], pmw)
        for w in range(G):
            st = base + w
            wlen = jnp.clip(lb - st, 0, m)
            best = better(popc2(s4[w]), m + wlen, zeros_i + st,
                          st + wlen, best)
        return best

    gmax = (jnp.max(lb) + G - 1) // G
    best = lax.fori_loop(0, gmax, group, best)
    bn, bd, bs, be = best
    valid = bn >= 0
    num_ref[:, :] = jnp.where(valid, bn, 0)
    den_ref[:, :] = jnp.where(valid, bd, 1)
    st_ref[:, :] = jnp.where(valid, bs, 0)
    en_ref[:, :] = jnp.where(valid, be, 0)


@functools.partial(jax.jit,
                   static_argnames=("LB", "W", "ntab", "sub", "interpret",
                                    "flat", "M8", "exact", "G"))
def _run(la, tabs, cand3, lb2, *, LB, W, ntab, sub=SUB, interpret=False,
         flat=None, M8=0, exact=False, G=8):
    nblocks = cand3.shape[1] // sub
    if M8:
        kern = functools.partial(_kernel_q, LB=LB, W=W, ntab=ntab,
                                 sub=sub, M8=M8, exact=exact, G=G)
    else:
        kern = functools.partial(
            _kernel, LB=LB, W=W, ntab=ntab, sub=sub,
            flat=(not interpret) if flat is None else flat)
    out = jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32)
    spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
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
        out_specs=(spec, spec, spec, spec),
        out_shape=(out, out, out, out),
        interpret=interpret,
    )(la, tabs, cand3, lb2)


def quantize_m(la: int):
    """Static-body compile keys for query length ``la``: ``(M8, exact)``."""
    M8 = -(-la // 8) * 8
    return M8, (la == M8)


def partial_ratio_1v_many(query: np.ndarray, cand3, lb2, *,
                          mode: str = "byte", staged=None,
                          interpret: bool = False, flat=None,
                          static_m: bool | None = None):
    """Best windows -> ``(num, den, start, end)`` i32 ``[B/128, 128]``.

    ``score = num / den`` (f64 on host); ``[start, end)`` is the best
    window's span in the candidate (tie-breaks identical to the host
    sweep: first best window in enumeration order).  Candidates SHORTER
    than the query get the un-swapped window sweep (candidate windows vs
    whole query), which is not the ecosystem's semantics — callers
    re-score ``lb < len(query)`` entries on the host path.
    """
    q = np.asarray(query)
    la = int(q.size)
    if la == 0:
        raise ValueError("empty query is a host-side special case")
    LB = int(cand3.shape[0]) * 4
    W = max(1, -(-la // 32))
    ntab = 2 if mode == "byte" else 1
    la_arr, tabs = staged if staged is not None else (
        jnp.array([la], jnp.int32), jnp.asarray(build_pm_tables(q, mode)))
    if static_m is None:
        static_m = not interpret       # hardware default: quantized body
    M8, exact = quantize_m(la) if static_m else (0, False)
    return _run(la_arr, tabs, cand3, lb2, LB=LB, W=W, ntab=ntab,
                interpret=interpret, flat=flat, M8=M8, exact=exact)
