"""Sweep Pallas kernel variants to find the fast configuration."""

import functools
import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def make_kernel(la, LB, W, ntab, sub, unroll, track_active, mask_state):
    last_word = (la - 1) // 32
    last_mask = jnp.uint32(1 << ((la - 1) % 32))

    def kernel(tab_ref, cand_ref, lb_ref, out_ref):
        lb = lb_ref[:, :]
        ones = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
        zeros = jnp.zeros((sub, LANE), jnp.uint32)

        def one_char(j, dist, vp, vn):
            c = cand_ref[j]
            if ntab == 2:
                clo = jnp.where(c < LANE, c, c - LANE)
                chi = c >= LANE
            else:
                clo = c
                chi = None
            hp_c = jnp.ones((sub, LANE), jnp.uint32)
            hn_c = jnp.zeros((sub, LANE), jnp.uint32)
            nvp, nvn = list(vp), list(vn)
            delta = None
            for w in range(W):
                t0 = jnp.take_along_axis(tab_ref[w * ntab], clo, axis=1)
                if ntab == 2:
                    t1 = jnp.take_along_axis(tab_ref[w * ntab + 1], clo,
                                             axis=1)
                    pmw = jnp.where(chi, t1, t0)
                else:
                    pmw = t0
                x = pmw | hn_c
                vpw, vnw = vp[w], vn[w]
                d0 = (((x & vpw) + vpw) ^ vpw) | x | vnw
                hp = vnw | ~(d0 | vpw)
                hn = d0 & vpw
                if w == last_word:
                    delta = ((hp >> ((la - 1) % 32)) & 1).astype(jnp.int32) \
                        - ((hn >> ((la - 1) % 32)) & 1).astype(jnp.int32)
                hp_out = hp >> 31
                hn_out = hn >> 31
                hp_s = (hp << 1) | hp_c
                hn_s = (hn << 1) | hn_c
                nvp[w] = hn_s | ~(d0 | hp_s)
                nvn[w] = hp_s & d0
                hp_c, hn_c = hp_out, hn_out
            if track_active:
                active = j < lb
                dist = jnp.where(active, dist + delta, dist)
                if mask_state:
                    for w in range(W):
                        nvp[w] = jnp.where(active, nvp[w], vp[w])
                        nvn[w] = jnp.where(active, nvn[w], vn[w])
            else:
                dist = dist + delta
            return dist, nvp, nvn

        def body(jj, state):
            dist, *rest = state
            vp = list(rest[:W])
            vn = list(rest[W:])
            for u in range(unroll):
                dist, vp, vn = one_char(jj * unroll + u, dist, vp, vn)
            return (dist, *vp, *vn)

        dist0 = jnp.full((sub, LANE), la, jnp.int32)
        state = (dist0,) + (ones,) * W + (zeros,) * W
        state = jax.lax.fori_loop(0, LB // unroll, body, state)
        out_ref[:, :] = state[0]

    return kernel


def run_variant(cfg, tabs, cand3, lb2, la, LB, W, ntab):
    sub, unroll, track_active, mask_state = cfg
    nblocks = cand3.shape[1] // sub
    kern = make_kernel(la, LB, W, ntab, sub, unroll, track_active, mask_state)
    f = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((W * ntab, sub, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
    )
    return jax.jit(f)


def main():
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
    from rapidfuzz_tpu import oracle

    rng = np.random.default_rng(42)
    LEN = 64
    B = 1048576
    q = rng.integers(97, 123, LEN, dtype=np.int32)
    corpus = rng.integers(97, 123, (B, LEN), dtype=np.int32)
    lens = np.full(B, LEN, np.int32)
    W = 2
    exp = [oracle.levenshtein_uniform(q.astype(np.int64),
                                      corpus[i].astype(np.int64))
           for i in range(0, B, B // 5)]

    for sub in (8, 16, 32):
        cand3 = jnp.transpose(jnp.asarray(corpus), (1, 0)).reshape(
            LEN, B // LANE, LANE)
        lb2 = jnp.asarray(lens).reshape(B // LANE, LANE)
        jax.block_until_ready(cand3)
        for ntab in (1, 2):
            t8 = lk.build_pm_tables(q, "byte" if ntab == 2 else "local")
            tabs = jnp.asarray(np.broadcast_to(
                t8[:, :1, :], (t8.shape[0], sub, LANE)).copy())
            for unroll, track, mask in [(1, True, True), (4, True, False),
                                        (8, True, False), (8, False, False),
                                        (16, True, False)]:
                cfg = (sub, unroll, track, mask)
                try:
                    fn = run_variant(cfg, tabs, cand3, lb2, LEN, LEN, W,
                                     ntab)
                    out = fn(tabs, cand3, lb2)
                    jax.block_until_ready(out)
                    flat = np.asarray(out).reshape(-1)
                    ok = all(flat[i] == e for i, e in
                             zip(range(0, B, B // 5), exp))
                    t0 = time.perf_counter()
                    for _ in range(10):
                        out = fn(tabs, cand3, lb2)
                    jax.block_until_ready(out)
                    dt = (time.perf_counter() - t0) / 10
                    print(json.dumps({
                        "sub": sub, "ntab": ntab, "unroll": unroll,
                        "track": track, "mask": mask, "ok": ok,
                        "ms": round(dt * 1e3, 3),
                        "Mpairs_s": round(B / dt / 1e6, 1)}), flush=True)
                except Exception as e:
                    print(json.dumps({"cfg": cfg, "ntab": ntab,
                                      "err": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
