"""Timing probe for the ROADMAP lastpos-tile Damerau design.

The design replaces the per-row 6-7-step packed roll scan with one
scratch load + one lane gather (``take_along_axis`` along the lane
axis).  Whether that wins hinges on the per-op cost of a dependent
lane gather vs a dependent roll at the damerau tile shape — this probe
times K-step dependent chains of each at (SUB, 128) int32:

  roll:    acc = min(acc, roll(acc, 1, axis=1))
  gather:  acc = min(acc, take_along_axis(acc, idx, axis=1))

with idx a fixed in-VMEM index tile (as the lastpos tiles would be).
If gather/roll <= ~6, the lastpos design nets positive (it removes
6-7 rolls and adds 1 gather + 1 scratch load per row).

Run on the TPU:  python experiments/damerau_gather_vs_roll.py
"""

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

LANE = 128


def _time(fn, iters=10, windows=3):
    out = fn()
    np.asarray(out.ravel()[:1])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def chain(mode, sub, K=6, steps=64):
    def kern(x_ref, idx_ref, o_ref):
        x = x_ref[:, :]
        idx = idx_ref[:, :]
        acc = x
        kk = jnp.int32(1)
        for _ in range(steps):
            for _k in range(K):
                if mode == "roll":
                    acc = jnp.minimum(acc, pltpu.roll(acc, 1, 1))
                elif mode == "gather":
                    acc = jnp.minimum(acc, jnp.take_along_axis(acc, idx, axis=1))
                else:
                    # alu baseline; xor + loop-varying addend so no
                    # strength-reduction pass can fold the chain away
                    acc = jnp.minimum(acc ^ 1, acc + kk)
                    kk = kk + 1
        o_ref[:, :] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((sub, LANE), jnp.int32),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (sub, LANE)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, LANE, (sub, LANE)).astype(np.int32))
    return _time(lambda: run(x, idx))


def main():
    for sub in (128, 512):
        t = {m: chain(m, sub) for m in ("alu", "roll", "gather")}
        print(json.dumps({
            "probe": "gather_vs_roll", "sub": sub, "K": 6, "steps": 64,
            "alu_ms": round(t["alu"] * 1e3, 3),
            "roll_ms": round(t["roll"] * 1e3, 3),
            "gather_ms": round(t["gather"] * 1e3, 3),
            "gather_per_roll": round(t["gather"] / max(t["roll"], 1e-9), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
