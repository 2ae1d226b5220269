"""Batched OSA (optimal string alignment) kernel.

Hyyrö bit-parallel Levenshtein extended with the transposition term
(``/root/reference/src/distance/osa.rs:84-135`` single word,
``osa.rs:156-227`` multi-word): per step the kernel keeps the previous
step's D0 and PM per word, and the transposition mask is

    tr = ((~d0_prev & pm) << 1  |  (~d0_prev[w-1] & pm[w-1]) >> 31) & pm_prev

folded into D0.  Word size 32 (u32 lanes), HP/HN carries across words as in
the Levenshtein kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .bitpack import FULL, pm_columns, test_bit


def osa_distance(a, la, b, lb):
    """True OSA distance for a batch of padded pairs -> int32[B]."""
    LA = a.shape[-1]
    W = LA // 32

    pm = pm_columns(a, b)
    B = pm.shape[0]
    la_b = jnp.broadcast_to(la, (B,))
    lb_b = jnp.broadcast_to(lb, (B,))
    last_pos = jnp.maximum(la_b - 1, 0)

    vp0 = jnp.full((B, W), FULL, jnp.uint32)
    vn0 = jnp.zeros((B, W), jnp.uint32)
    d00 = jnp.zeros((B, W), jnp.uint32)
    pm0 = jnp.zeros((B, W), jnp.uint32)
    dist0 = la_b.astype(jnp.int32)

    pm_t = jnp.moveaxis(pm, 1, 0)
    js = jnp.arange(pm_t.shape[0], dtype=jnp.int32)

    def step(carry, inp):
        vp, vn, d0_prev, pm_prev, dist = carry
        pm_j, j = inp
        active = (j < lb_b)

        hp_c = jnp.ones((B,), jnp.uint32)
        hn_c = jnp.zeros((B,), jnp.uint32)
        hp_words, hn_words = [], []
        new_vp, new_vn, new_d0 = [], [], []
        for w in range(W):
            p = pm_j[:, w]
            d0p = d0_prev[:, w]
            tr = (~d0p & p) << 1
            if w > 0:
                tr = tr | ((~d0_prev[:, w - 1] & pm_j[:, w - 1]) >> 31)
            tr = tr & pm_prev[:, w]

            x = p | hn_c
            vpw = vp[:, w]
            vnw = vn[:, w]
            d0 = ((((x & vpw) + vpw) ^ vpw) | x | vnw) | tr
            hp = vnw | ~(d0 | vpw)
            hn = d0 & vpw
            hp_words.append(hp)
            hn_words.append(hn)
            hp_out = hp >> 31
            hn_out = hn >> 31
            hp_s = (hp << 1) | hp_c
            hn_s = (hn << 1) | hn_c
            new_vp.append(hn_s | ~(d0 | hp_s))
            new_vn.append(hp_s & d0)
            new_d0.append(d0)
            hp_c, hn_c = hp_out, hn_out

        hp_all = jnp.stack(hp_words, axis=-1)
        hn_all = jnp.stack(hn_words, axis=-1)
        delta = test_bit(hp_all, last_pos) - test_bit(hn_all, last_pos)
        dist = jnp.where(active, dist + delta, dist)

        sel = active[:, None]
        vp = jnp.where(sel, jnp.stack(new_vp, axis=-1), vp)
        vn = jnp.where(sel, jnp.stack(new_vn, axis=-1), vn)
        d0_prev = jnp.where(sel, jnp.stack(new_d0, axis=-1), d0_prev)
        pm_prev = jnp.where(sel, pm_j, pm_prev)
        return (vp, vn, d0_prev, pm_prev, dist), None

    (_, _, _, _, dist), _ = lax.scan(
        step, (vp0, vn0, d00, pm0, dist0), (pm_t, js))
    dist = jnp.where(la_b == 0, lb_b, dist)
    return dist
