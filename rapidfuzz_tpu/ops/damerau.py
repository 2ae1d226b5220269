"""Batched unrestricted Damerau-Levenshtein kernel.

Semantics of the reference's Zhao-Sahni linear-space algorithm
(``/root/reference/src/distance/damerau_levenshtein.rs:111-168``),
restructured for TPU: the two sequential last-occurrence structures become
carried/derived state —

* ``k`` (last row < i whose ``a`` char equals ``b[j]``) is a running
  elementwise max carried across the row scan,
* ``l`` (last column < j in the current row whose ``b`` char equals
  ``a[i]``) is an exclusive running max along the row, computed with an
  associative scan,
* ``FR[j] = D[k-1][j-2]`` is carried state updated at match positions,
* ``t = D[i-2][l-1]`` is a row gather from the i-2 row,

and the within-row left-neighbour dependency ``new[j-1] + 1`` is a
min-plus prefix scan (log depth), as in the weighted Levenshtein kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

BIG = jnp.int32(1 << 28)


def damerau_distance(a, la, b, lb):
    """True unrestricted Damerau-Levenshtein distance -> int32[B]."""
    LA = a.shape[-1]
    LB = b.shape[-1]

    eq = (a[..., :, None] == b[..., None, :]) & (b[..., None, :] >= 0)
    # eq[i, j] for i in 0..LA-1 (rows = a), j in 0..LB-1 (cols = b)
    B = eq.shape[0]
    la_b = jnp.broadcast_to(la, (B,))
    lb_b = jnp.broadcast_to(lb, (B,))

    j1 = jnp.arange(1, LB + 1, dtype=jnp.int32)          # 1-based cols
    # D rows are [B, LB+1], D[i][j] for j=0..LB
    row0 = jnp.broadcast_to(jnp.arange(LB + 1, dtype=jnp.int32),
                            (B, LB + 1)).astype(jnp.int32)

    eq_t = jnp.moveaxis(eq, 1, 0)                        # [LA, B, LB]
    iidx = jnp.arange(1, LA + 1, dtype=jnp.int32)        # 1-based rows

    init = (
        row0,                                            # D_{i-1}
        jnp.full((B, LB + 1), BIG, jnp.int32),           # D_{i-2} (unused at i=1)
        jnp.zeros((B, LB), jnp.int32),                   # K: last row matching b[j]
        jnp.full((B, LB), BIG, jnp.int32),               # FR[j] = D[k-1][j-2]
    )

    def step(carry, inp):
        dim1, dim2, K, FR = carry
        eq_i, i = inp                                    # eq_i: [B, LB]
        active = (i <= la_b)

        # L[j]: last col < j (1-based) of current row matching a[i]
        # exclusive cummax of j1 * eq_i along the row
        match_pos = jnp.where(eq_i, j1, 0)
        cmax = lax.associative_scan(jnp.maximum, match_pos, axis=-1)
        L = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), cmax[:, :-1]], axis=-1)

        diag = dim1[:, :-1]                              # D_{i-1}[j-1]
        up = dim1[:, 1:]                                 # D_{i-1}[j]
        cost = jnp.where(eq_i, 0, 1).astype(jnp.int32)
        cand = jnp.minimum(diag + cost, up + 1)

        # transposition candidates (Zhao's two exclusive cases), only
        # where chars differ
        t = jnp.take_along_axis(
            dim2, jnp.maximum(L - 1, 0), axis=-1)        # D_{i-2}[l-1]
        t = jnp.where(L >= 1, t, BIG)
        case1 = jnp.where(j1[None, :] - L == 1, FR + (i - K), BIG)
        case2 = jnp.where((i - K == 1) & (j1[None, :] - L != 1),
                          t + (j1[None, :] - L), BIG)
        tr = jnp.minimum(case1, case2)
        cand = jnp.where(eq_i, cand, jnp.minimum(cand, tr))

        # left-neighbour: new[j] = min(cand[j], new[j-1]+1); new[0] = i
        head = jnp.full((B, 1), i, jnp.int32)
        tvec = jnp.concatenate([head, cand], axis=-1)    # [B, LB+1]
        ramp = jnp.arange(LB + 1, dtype=jnp.int32)
        new = lax.associative_scan(jnp.minimum, tvec - ramp, axis=-1) + ramp

        # state updates (after the row)
        dim1_slice = jnp.concatenate(
            [jnp.full((B, 1), BIG, jnp.int32), dim1[:, :-2]], axis=-1)
        # dim1_slice[j-1] == D_{i-1}[j-2] for 1-based j (BIG for j==1)
        FR_new = jnp.where(eq_i, dim1_slice, FR)
        K_new = jnp.maximum(K, jnp.where(eq_i, i, 0))

        sel = active[:, None]
        out = (
            jnp.where(sel, new, dim1),
            jnp.where(sel, dim1, dim2),
            jnp.where(sel, K_new, K),
            jnp.where(sel, FR_new, FR),
        )
        return out, None

    (dfinal, _, _, _), _ = lax.scan(step, init, (eq_t, iidx))
    pos = jnp.arange(LB + 1, dtype=jnp.int32)
    return jnp.sum(jnp.where(pos == lb_b[:, None], dfinal, 0),
                   axis=-1, dtype=jnp.int32)
