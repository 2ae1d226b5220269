"""TPU compile + correctness + rate check for the streaming kernels.

Covers what landed while the tunnel was down: OSA / Jaro / weighted-Lev
chunk-streaming kernels, the 16-step fori band unroll, and the jaro
stream's doubled chunk axis.  Small corpora (256k) — this validates
Mosaic compilation and exactness on hardware, not peak throughput.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rapidfuzz_tpu import oracle
from rapidfuzz_tpu.ops.pallas import band_kernel as bk
from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
from rapidfuzz_tpu.ops.pallas import stream_kernel as sk
from rapidfuzz_tpu.distance.jaro import sim_from_components


def corpus(B, LB, lo=97, hi=105, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, LB + 1, B).astype(np.int32)
    lens[:4] = [0, LB, LB // 2, 7]
    chars = rng.integers(lo, hi, (B, LB)).astype(np.int32)
    for i in (0, 1, 2, 3, 37, 101):
        chars[i, lens[i]:] = -1
    cand3, lb2 = lk.prepare_corpus(jnp.asarray(chars), jnp.asarray(lens),
                                   LB=LB)
    return chars, lens, jax.block_until_ready(cand3), lb2


def check(name, got, exp_fn, chars, lens, idxs, tol=0):
    bad = []
    for i in idxs:
        exp = exp_fn(chars[i, :lens[i]].astype(np.int64))
        if abs(float(got[i]) - exp) > tol:
            bad.append((i, float(got[i]), exp))
    print(f"{name}: {'OK' if not bad else bad[:3]}", flush=True)
    return not bad


def main():
    B, LB = 1 << 18, 1536
    rng = np.random.default_rng(5)
    q = rng.integers(97, 105, 48).astype(np.int32)
    q64 = q.astype(np.int64)
    chars, lens, cand3, lb2 = corpus(B, LB)
    idxs = list(range(0, B, 37813)) + [0, 1, 2, 3]
    mode = lk.pick_mode(q, 104)

    t0 = time.time()
    out = np.asarray(sk.osa_stream_1v_many(q, cand3, lb2,
                                           mode=mode)).reshape(-1)
    print(f"osa_stream compile+run {time.time()-t0:.0f}s")
    check("osa_stream", out, lambda c: oracle.osa(q64, c), chars, lens,
          idxs)

    t0 = time.time()
    common, trans = sk.jaro_stream_1v_many(q, cand3, lb2, mode=mode)
    common = np.asarray(common).reshape(-1)
    trans = np.asarray(trans).reshape(-1)
    print(f"jaro_stream compile+run {time.time()-t0:.0f}s")
    got = [float(sim_from_components(np.int64(common[i]),
                                     np.int64(trans[i]),
                                     np.int64(q.size), np.int64(lens[i])))
           for i in idxs]
    bad = [(i, g, oracle.jaro(q64, chars[i, :lens[i]].astype(np.int64)))
           for i, g in zip(idxs, got)
           if abs(g - oracle.jaro(q64,
                                  chars[i, :lens[i]].astype(np.int64)))
           > 1e-12]
    print(f"jaro_stream: {'OK' if not bad else bad[:3]}", flush=True)

    t0 = time.time()
    out = np.asarray(sk.wlev_stream_1v_many(
        q, cand3, lb2, ins=2, dele=3, sub_cost=5,
        mode=mode)).reshape(-1)
    print(f"wlev_stream compile+run {time.time()-t0:.0f}s")
    check("wlev_stream", out,
          lambda c: oracle.levenshtein_weighted(q64, c, 2, 3, 5),
          chars, lens, idxs)

    # fori-form band with the 16-step unroll (LB*bw > FLAT_MAX_STEPS)
    chars2, lens2, cand32, lb22 = corpus(B, 256, seed=2)
    q2 = rng.integers(97, 105, 64).astype(np.int32)
    stg = bk.stage_banded(q2, "byte", 256, 33)
    t0 = time.time()
    out = np.asarray(bk.lev_banded_1v_many(
        q2, cand32, lb22, cutoff=33, mode="byte",
        staged=stg)).reshape(-1)
    print(f"band fori-unroll compile+run {time.time()-t0:.0f}s")
    q264 = q2.astype(np.int64)
    bad = 0
    for i in list(range(0, B, 37813)) + [0, 1, 2, 3]:
        exp = oracle.levenshtein_uniform(q264,
                                         chars2[i, :lens2[i]].astype(
                                             np.int64))
        g = out[i]
        bad += (g != exp) if exp <= 33 else (g <= 33)
    print(f"band fori-unroll: {'OK' if not bad else f'{bad} bad'}")

    # streamed band kernel: cutoff<=47 on a >1024-char bucket
    q4 = rng.integers(97, 105, 200).astype(np.int32)
    t0 = time.time()
    out = np.asarray(bk.lev_banded_stream_1v_many(
        q4, cand3, lb2, cutoff=20, mode=mode)).reshape(-1)
    print(f"band_stream compile+run {time.time()-t0:.0f}s")
    q464 = q4.astype(np.int64)
    bad = 0
    for i in idxs:
        exp = oracle.levenshtein_uniform(q464,
                                         chars[i, :lens[i]].astype(np.int64))
        g = out[i]
        bad += (g != exp) if exp <= 20 else (g <= 20)
    print(f"band_stream: {'OK' if not bad else f'{bad} bad'}", flush=True)

    # windowed partial_ratio kernel (flat TPU body): exactness + rate
    from rapidfuzz_tpu import fuzz
    from rapidfuzz_tpu.ops.pallas import partial_kernel as pk
    chars3, lens3, cand33, lb23 = corpus(B, 64, seed=3)
    q3 = rng.integers(97, 105, 24).astype(np.int32)
    t0 = time.time()
    num, den, _, _ = pk.partial_ratio_1v_many(q3, cand33, lb23,
                                              mode="byte")
    num = np.asarray(num).reshape(-1)
    den = np.asarray(den).reshape(-1)
    print(f"partial_window compile+run {time.time()-t0:.0f}s")
    bad = []
    for i in list(range(0, B, 37813)) + [0, 1, 2, 3]:
        n = int(lens3[i])
        if n < q3.size:
            continue
        exp, _ = fuzz._best_window(q3.astype(np.int64),
                                   chars3[i, :n].astype(np.int64))
        if abs(exp - num[i] / den[i]) > 1e-12:
            bad.append((i, exp, num[i] / den[i]))
    print(f"partial_window: {'OK' if not bad else bad[:3]}", flush=True)

    # quick rates at this small B (dispatch-bound; compile sanity only)
    for name, fn in [
        ("osa_stream", lambda: sk.osa_stream_1v_many(q, cand3, lb2,
                                                     mode=mode)),
        ("jaro_stream", lambda: sk.jaro_stream_1v_many(q, cand3, lb2,
                                                       mode=mode)[0]),
        ("wlev_stream", lambda: sk.wlev_stream_1v_many(
            q, cand3, lb2, ins=2, dele=3, sub_cost=5, mode=mode)),
        ("partial_window", lambda: pk.partial_ratio_1v_many(
            q3, cand33, lb23, mode="byte")[0]),
        ("band_stream", lambda: bk.lev_banded_stream_1v_many(
            q4, cand3, lb2, cutoff=20, mode=mode)),
    ]:
        out = fn()
        np.asarray(out[:1, :1])
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / 3
        print(f"{name}: {B/dt/1e6:.1f}M cands/s ({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
