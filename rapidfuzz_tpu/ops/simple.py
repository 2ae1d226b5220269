"""Trivial vectorized metrics: Hamming, prefix, postfix.

Reference semantics:
* Hamming (``/root/reference/src/distance/hamming.rs:138-161``): zip-count
  mismatches; length overhang counts one per element (padding mode —
  the no-padding length check lives in the host API layer).
* prefix/postfix (``src/distance/prefix.rs:52-68``, ``postfix.rs``):
  similarity = common prefix/suffix length.
"""

from __future__ import annotations

import jax.numpy as jnp


def _minlen_mask(la, lb, L):
    idx = jnp.arange(L, dtype=jnp.int32)
    return idx < jnp.minimum(la, lb)[..., None]


def hamming_distance(a, la, b, lb):
    L = min(a.shape[-1], b.shape[-1])
    B = max(a.shape[0], b.shape[0])
    la_b = jnp.broadcast_to(la, (B,))
    lb_b = jnp.broadcast_to(lb, (B,))
    m = _minlen_mask(la_b, lb_b, L)
    mism = jnp.sum((a[..., :L] != b[..., :L]) & m, axis=-1, dtype=jnp.int32)
    return mism + jnp.abs(la_b - lb_b)


def prefix_similarity(a, la, b, lb):
    L = min(a.shape[-1], b.shape[-1])
    B = max(a.shape[0], b.shape[0])
    la_b = jnp.broadcast_to(la, (B,))
    lb_b = jnp.broadcast_to(lb, (B,))
    eq = (a[..., :L] == b[..., :L]) & _minlen_mask(la_b, lb_b, L)
    return jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=-1),
                   axis=-1, dtype=jnp.int32)


def postfix_similarity(a, la, b, lb):
    L = min(a.shape[-1], b.shape[-1])
    B = max(a.shape[0], b.shape[0])
    la_b = jnp.broadcast_to(la, (B,))
    lb_b = jnp.broadcast_to(lb, (B,))
    # align string ends: compare a[la-1-k] vs b[lb-1-k]
    k = jnp.arange(L, dtype=jnp.int32)
    ia = jnp.clip(la_b[..., None] - 1 - k, 0, a.shape[-1] - 1)
    ib = jnp.clip(lb_b[..., None] - 1 - k, 0, b.shape[-1] - 1)
    av = jnp.take_along_axis(jnp.broadcast_to(a, (B, a.shape[-1])), ia, axis=-1)
    bv = jnp.take_along_axis(jnp.broadcast_to(b, (B, b.shape[-1])), ib, axis=-1)
    eq = (av == bv) & _minlen_mask(la_b, lb_b, L)
    return jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=-1),
                   axis=-1, dtype=jnp.int32)
