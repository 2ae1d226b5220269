"""Batched LCS-length kernel (Hyyrö bit-parallel, u32 lanes).

Reference recurrence (``/root/reference/src/distance/lcs_seq.rs:199-261``):
per text char, per word: ``u = s & pm; s = ((s + u + c) | (s - u))`` with an
add carry chained across words (``carrying_add``,
``src/details/intrinsics.rs:25-29``).  ``LCS = popcount of zero bits``.

Invariant exploited for padding: bits at positions >= len(pattern) stay 1
forever (``u`` is a subset of ``s`` so ``s - u`` never borrows, and the OR
restores high bits), so no validity mask is needed on the popcount.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .bitpack import FULL, add_with_carry, pm_columns, popcount


def lcs_similarity(a: jnp.ndarray, la: jnp.ndarray,
                   b: jnp.ndarray, lb: jnp.ndarray) -> jnp.ndarray:
    """True LCS length for a batch of padded pairs -> int32[B]."""
    LA = a.shape[-1]
    W = LA // 32

    pm = pm_columns(a, b)                     # [B, LB, W]
    B = pm.shape[0]
    lb_b = jnp.broadcast_to(lb, (B,))

    s0 = jnp.full((B, W), FULL, jnp.uint32)
    pm_t = jnp.moveaxis(pm, 1, 0)
    js = jnp.arange(pm_t.shape[0], dtype=jnp.int32)

    def step(s, inp):
        pm_j, j = inp
        active = (j < lb_b)
        carry = jnp.zeros((B,), jnp.uint32)
        words = []
        for w in range(W):
            sw = s[:, w]
            u = sw & pm_j[:, w]
            x, carry = add_with_carry(sw, u, carry)
            words.append(x | (sw - u))
        s_new = jnp.stack(words, axis=-1)
        s = jnp.where(active[:, None], s_new, s)
        return s, None

    s, _ = lax.scan(step, s0, (pm_t, js))
    return jnp.sum(popcount(~s), axis=-1, dtype=jnp.int32)


def lcs_record(a: jnp.ndarray, la: jnp.ndarray,
               b: jnp.ndarray, lb: jnp.ndarray):
    """LCS length with every per-column ``S`` bit-row recorded.

    Enables host-side alignment traceback (indel/LCS editops): the zero
    bits of ``S_j`` mark the pattern rows where column j gains a match,

        L[i][j] = popcount(~S_j & mask(i)),

    so cell values of the LCS DP table reconstruct from the recorded rows.
    Returns ``(sim[B], s[LB, B, W])`` (uint32 words).
    """
    LA = a.shape[-1]
    W = LA // 32

    pm = pm_columns(a, b)
    B = pm.shape[0]
    lb_b = jnp.broadcast_to(lb, (B,))

    s0 = jnp.full((B, W), FULL, jnp.uint32)
    pm_t = jnp.moveaxis(pm, 1, 0)
    js = jnp.arange(pm_t.shape[0], dtype=jnp.int32)

    def step(s, inp):
        pm_j, j = inp
        active = (j < lb_b)
        carry = jnp.zeros((B,), jnp.uint32)
        words = []
        for w in range(W):
            sw = s[:, w]
            u = sw & pm_j[:, w]
            x, carry = add_with_carry(sw, u, carry)
            words.append(x | (sw - u))
        s = jnp.where(active[:, None], jnp.stack(words, axis=-1), s)
        return s, s

    s, rows = lax.scan(step, s0, (pm_t, js))
    return jnp.sum(popcount(~s), axis=-1, dtype=jnp.int32), rows
