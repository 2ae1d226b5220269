"""Ablation: what do the PM gathers cost in the headline lev kernel?

ROADMAP lead 1 ("headline beyond 1.38e9") hinges on whether the per-char
`dynamic_gather` PM lookups are a meaningful slice of the issue-limited
body.  This times three SEMANTICS-BREAKING variants of the local-mode
one_char body at the nq shape (timing-only; results are discarded):

  real     — the shipped body (1 gather per word per char)
  nogather — PM word replaced by a reused constant tile (gathers gone,
             everything else identical)
  noshift  — gathers kept, the carry-chain shifts removed (for contrast)

If nogather ~= real, gathers are free on this body and lead 1 is dead;
the delta otherwise bounds the best possible win from any
gather-reduction scheme.

Run on the TPU:  python -u experiments/lev_gather_ablate.py
"""

import functools
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 32
UNROLL = 16


def _kernel(la_ref, tab_ref, cand_ref, lb_ref, out_ref, *, LB, W,
            unroll, sub, mode):
    la = la_ref[0]
    lb = lb_ref[:, :]
    last_bit = ((la - 1) & 31).astype(jnp.uint32)
    ones = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros = jnp.zeros((sub, LANE), jnp.uint32)

    def one_char(row, u, j, dist, vp, vn):
        sh = 8 * (u % 4)
        c = ((row >> sh) if sh else row) & jnp.uint32(0xFF)
        c = c.astype(jnp.int32)
        hp_c = jnp.ones((sub, LANE), jnp.uint32)
        hn_c = jnp.zeros((sub, LANE), jnp.uint32)
        nvp, nvn = list(vp), list(vn)
        delta = None
        for w in range(W):
            if mode == "nogather":
                pmw = tab_ref[w][0, 0] + c.astype(jnp.uint32)  # no gather
            else:
                pmw = jnp.take_along_axis(tab_ref[w], c, axis=1)
            x = pmw | hn_c
            vpw, vnw = vp[w], vn[w]
            d0 = (((x & vpw) + vpw) ^ vpw) | x | vnw
            hp = vnw | ~(d0 | vpw)
            hn = d0 & vpw
            if w == W - 1:
                delta = (((hp >> last_bit) & 1).astype(jnp.int32)
                         - ((hn >> last_bit) & 1).astype(jnp.int32))
            if mode == "noshift":
                nvp[w] = hn | ~(d0 | hp)
                nvn[w] = hp & d0
            else:
                hp_out = hp >> 31
                hn_out = hn >> 31
                hp_s = (hp << 1) | hp_c
                hn_s = (hn << 1) | hn_c
                nvp[w] = hn_s | ~(d0 | hp_s)
                nvn[w] = hp_s & d0
                hp_c, hn_c = hp_out, hn_out
        dist = jnp.where(j < lb, dist + delta, dist)
        return dist, nvp, nvn

    def body(jj, state):
        dist, *rest = state
        vp = list(rest[:W])
        vn = list(rest[W:])
        row = None
        for u in range(unroll):
            if u % 4 == 0:
                row = cand_ref[jj * (unroll // 4) + u // 4]
            dist, vp, vn = one_char(row, u, jj * unroll + u, dist, vp, vn)
        return (dist, *vp, *vn)

    dist0 = jnp.broadcast_to(la, (sub, LANE)).astype(jnp.int32)
    state = (dist0,) + (ones,) * W + (zeros,) * W
    trips = (jnp.max(lb) + (unroll - 1)) // unroll
    state = jax.lax.fori_loop(0, trips, body, state)
    out_ref[:, :] = state[0]


@functools.partial(jax.jit, static_argnames=("LB", "W", "unroll", "sub",
                                             "mode"))
def _run(la, tabs, cand3, lb2, *, LB, W, unroll=UNROLL, sub=SUB,
         mode="real"):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, W=W, unroll=unroll, sub=sub,
                             mode=mode)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W, sub, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB // 4, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
    )(la, tabs, cand3, lb2)


def main():
    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(3)
    LB, W = 64, 2
    B = 1 << 24
    chars = rng.integers(97, 123, (B, LB)).astype(np.int32)
    lens = np.full(B, LB, np.int32)
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    cand3 = jax.block_until_ready(jax.device_put(cand3))
    q = rng.integers(97, 123, LB)
    tabs = jnp.asarray(lk.build_pm_tables(q, "local"))
    la = jnp.array([LB], jnp.int32)

    def sync(o):
        np.asarray(o.ravel()[:1])

    base = None
    for mode in ("real", "nogather", "noshift"):
        try:
            sync(_run(la, tabs, cand3, lb2, LB=LB, W=W, mode=mode))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": mode, "error": str(e)[:160]}),
                  flush=True)
            continue
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(4):
                out = _run(la, tabs, cand3, lb2, LB=LB, W=W, mode=mode)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        rate = B / best
        if mode == "real":
            base = rate
        print(json.dumps({"mode": mode, "ms": round(best * 1e3, 3),
                          "pairs_per_s": round(rate),
                          "vs_real": round(rate / base, 3) if base else 1}),
              flush=True)


if __name__ == "__main__":
    main()
