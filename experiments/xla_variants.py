"""Throughput experiments for the uniform Levenshtein XLA path (TPU)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rapidfuzz_tpu.ops.bitpack import FULL, pm_columns, test_bit


def lev_scan(a, la, b, lb, unroll=1):
    LA = a.shape[-1]
    W = LA // 32
    pm = pm_columns(a, b)
    B = pm.shape[0]
    la_b = jnp.broadcast_to(la, (B,))
    lb_b = jnp.broadcast_to(lb, (B,))
    last_pos = jnp.maximum(la_b - 1, 0)
    vp0 = jnp.full((B, W), FULL, jnp.uint32)
    vn0 = jnp.zeros((B, W), jnp.uint32)
    dist0 = la_b.astype(jnp.int32)
    pm_t = jnp.moveaxis(pm, 1, 0)
    js = jnp.arange(pm_t.shape[0], dtype=jnp.int32)

    def step(carry, inp):
        vp, vn, dist = carry
        pm_j, j = inp
        active = (j < lb_b)
        hp_c = jnp.ones((B,), jnp.uint32)
        hn_c = jnp.zeros((B,), jnp.uint32)
        hp_words, hn_words, new_vp, new_vn = [], [], [], []
        for w in range(W):
            x = pm_j[:, w] | hn_c
            vpw = vp[:, w]
            vnw = vn[:, w]
            d0 = (((x & vpw) + vpw) ^ vpw) | x | vnw
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
            hp_c, hn_c = hp_out, hn_out
        hp_all = jnp.stack(hp_words, axis=-1)
        hn_all = jnp.stack(hn_words, axis=-1)
        delta = test_bit(hp_all, last_pos) - test_bit(hn_all, last_pos)
        dist = jnp.where(active, dist + delta, dist)
        vp = jnp.where(active[:, None], jnp.stack(new_vp, -1), vp)
        vn = jnp.where(active[:, None], jnp.stack(new_vn, -1), vn)
        return (vp, vn, dist), None

    (_, _, dist), _ = lax.scan(step, (vp0, vn0, dist0), (pm_t, js),
                               unroll=unroll)
    return jnp.where(la_b == 0, lb_b, dist)


def bench(fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    LEN = 64
    dev = jax.devices()[0]
    for B in (16384, 65536):
        q = rng.integers(97, 123, (1, LEN), dtype=np.int32)
        c = rng.integers(97, 123, (B, LEN), dtype=np.int32)
        ql = np.array([LEN], np.int32)
        cl = np.full(B, LEN, np.int32)
        args = tuple(jax.device_put(x, dev) for x in (q, ql, c, cl))
        for unroll in (1, 8, 64):
            f = jax.jit(lambda a, la, b, lb, u=unroll: lev_scan(a, la, b, lb, u))
            dt = bench(f, args)
            print(json.dumps({"B": B, "unroll": unroll, "ms": dt * 1e3,
                              "pairs_per_s": B / dt}), flush=True)


if __name__ == "__main__":
    main()
