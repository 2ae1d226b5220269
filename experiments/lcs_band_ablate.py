"""Why is the banded-LCS kernel ~10x off the banded-lev kernel?

At 512-char/cutoff-15 the lev band delivers ~190M cands/s (7.9x its
full kernel) while the LCS band — a structurally SIMPLER O(bw)-per-char
step — measures 18.8M (1.54x its full kernel,
evidence/lcs_band_speed_r4.log).  This probe times the real public
routes side by side at identical shapes, then semantics-breaking
ablations of the LCS step body to locate the cost:

  real      — replica of the shipped step (sanity vs the public route)
  nocarry   — bw=1 specialization: drop add_with_carry's carry-out math
  noacc     — drop the per-step dropped-bit accumulator update
  fixedtab  — gather every step from table row 0 (kills the per-step
              table walk; wrong results, timing only)
  nogather  — PM word = constant (no gather at all)
  fori      — real body, 16x fori loop instead of the 512-step flat
              unroll
  sub64     — real body at sub=64

Run on the TPU:  python -u experiments/lcs_band_ablate.py
"""

import functools
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

from rapidfuzz_tpu.ops.bitpack import add_with_carry
from rapidfuzz_tpu.ops.pallas import band_kernel as bk
from rapidfuzz_tpu.ops.pallas import lcs_band_kernel as cbk
from rapidfuzz_tpu.ops.pallas import lcs_kernel as lck
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk

LANE = 128


def _kernel(scal_ref, tab_ref, cand_ref, lb_ref, out_ref, *, LB: int,
            sub: int, variant: str, flat: bool):
    ones_t = jnp.full((sub, LANE), 0xFFFFFFFF, jnp.uint32)
    zeros_t = jnp.zeros((sub, LANE), jnp.uint32)
    one_t = jnp.full((sub, LANE), 1, jnp.uint32)

    def one_step(j, row, u, state):
        acc, s = state
        c = ((row >> jnp.uint32(8 * u))
             & jnp.uint32(0xFF)).astype(jnp.int32)
        if variant == "nogather":
            x = s ^ c.astype(jnp.uint32)
        else:
            ti = 0 if variant == "fixedtab" else j
            t0 = jnp.broadcast_to(tab_ref[ti], (sub, LANE))
            x = jnp.take_along_axis(t0, c, axis=1)
        uu = s & x
        if variant == "nocarry":
            ns = (s + uu) | (s ^ uu)
        else:
            t, _ = add_with_carry(s, uu, zeros_t)
            ns = t | (s ^ uu)
        if variant != "noacc":
            acc = acc + (~ns & one_t).astype(jnp.int32)
        ns = (ns >> 1) | jnp.full((sub, LANE), 1 << 31, jnp.uint32)
        return acc, ns

    acc0 = jnp.zeros((sub, LANE), jnp.int32)
    if flat:
        state = (acc0, ones_t)
        for jj in range(LB // 4):
            row = cand_ref[jj]
            for u in range(4):
                state = one_step(jj * 4 + u, row, u, state)
        acc, s = state
    else:
        def body(jj, state):
            acc, s = state
            for r in range(4):
                row = cand_ref[jj * 4 + r]
                for u in range(4):
                    acc, s = one_step(jj * 16 + r * 4 + u, row, u,
                                      (acc, s))
            return acc, s

        acc, s = jax.lax.fori_loop(0, LB // 16, body, (acc0, ones_t))

    acc = acc + cbk._popcount32(~s)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("LB", "sub", "variant",
                                             "flat"))
def _run(scal, tabs, cand3, lb2, *, LB, sub, variant, flat):
    nblocks = cand3.shape[1] // sub
    kern = functools.partial(_kernel, LB=LB, sub=sub, variant=variant,
                             flat=flat)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((LB, 1, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB // 4, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cand3.shape[1], LANE), jnp.int32),
    )(scal, tabs, cand3, lb2)


def dev_corpus(LB, B, seed):
    step = max(1 << 18, (1 << 28) // (LB * 4))
    packed = []
    for s in range(0, B, step):
        n = min(step, B - s)
        c = jax.jit(lambda k, n=n: jax.random.randint(
            k, (n, LB), 97, 123, jnp.int32))(jax.random.PRNGKey(seed + s))
        c3, _ = lk.prepare_corpus(c, jnp.full((n,), LB, jnp.int32), LB=LB)
        packed.append(jax.block_until_ready(c3))
        del c
    cand3 = packed[0] if len(packed) == 1 else jnp.concatenate(packed,
                                                               axis=1)
    lb2 = jnp.full((B // 128, 128), LB, jnp.int32)
    return jax.block_until_ready(cand3), lb2


def rate(fn, B):
    out = fn()
    np.asarray(out.ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(6):
            out = fn()
        np.asarray(out.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / 6)
    return B / best, best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(5)
    LB, cutoff = 512, 15
    B = 1 << 20
    cand3, lb2 = dev_corpus(LB, B, 3)
    q = rng.integers(97, 123, LB).astype(np.int32)

    # public routes, staged tables (apples to apples)
    bw = bk.band_words(cutoff)
    lev_staged = (jnp.asarray(bk.build_shifted_tables(q, "local", LB, bw)),
                  jnp.asarray(bk.probe_table(LB, LB, bw)))
    r, ms = rate(lambda: bk.lev_banded_1v_many(
        q, cand3, lb2, cutoff=cutoff, mode="local",
        staged=lev_staged), B)
    print(json.dumps({"route": "lev_banded", "cands_per_s": round(r),
                      "ms": round(ms * 1e3, 2)}), flush=True)

    cstab = jnp.asarray(cbk.build_shifted_tables(q, "local", LB, 1))
    r, ms = rate(lambda: cbk.lcs_banded_1v_many(
        q, cand3, lb2, cutoff=cutoff, mode="local", staged=cstab), B)
    print(json.dumps({"route": "lcs_banded", "cands_per_s": round(r),
                      "ms": round(ms * 1e3, 2)}), flush=True)

    r, ms = rate(lambda: lck.lcs_1v_many(
        q, cand3, lb2, mode="local"), B)
    print(json.dumps({"route": "lcs_full", "cands_per_s": round(r),
                      "ms": round(ms * 1e3, 2)}), flush=True)

    scal = jnp.array([LB, cutoff], jnp.int32)
    for variant, sub, flat in (
            ("real", 32, True), ("nocarry", 32, True),
            ("noacc", 32, True), ("fixedtab", 32, True),
            ("nogather", 32, True), ("real", 32, False),
            ("real", 64, True), ("nocarry", 64, False)):
        try:
            r, ms = rate(lambda: _run(scal, cstab, cand3, lb2, LB=LB,
                                      sub=sub, variant=variant,
                                      flat=flat), B)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": variant, "sub": sub,
                              "flat": flat,
                              "error": str(e)[:140]}), flush=True)
            continue
        print(json.dumps({"variant": variant, "sub": sub, "flat": flat,
                          "cands_per_s": round(r),
                          "ms": round(ms * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
