"""Hardware probe: cutoff-banded Damerau rate vs band radius.

One corpus (16M len-64 pairs-in-lanes tiles, ~4 expected edits per
candidate), three band radii (the scanner's pick_dam_band buckets) plus
the full kernel — the k-curve behind the official damband phase.

Run on the TPU:  python experiments/damerau_band_curve.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk

LEN = 64
Bd = 1 << 24


def main():
    rng = np.random.default_rng(42)
    query = rng.integers(97, 123, LEN, dtype=np.int32)
    sub = dk.SEQ_SUB
    lbmax = -(-max(LEN, 16) // 16) * 16
    nbk = Bd // (sub * 128)
    nbc = min(nbk, (1 << 21) // (sub * 128))

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        r = jax.random.randint(k1, (nbc, sub, 128, LEN), 97, 123,
                               jnp.int32)
        m = jax.random.uniform(k2, (nbc, sub, 128, LEN)) < (4.0 / LEN)
        c = jnp.where(m, r, jnp.asarray(query)[None, None, None, :])
        b = jnp.full((nbc, sub, 128, lbmax), -2, jnp.int32)
        b = b.at[..., :LEN].set(c)
        return (b.transpose(0, 3, 1, 2).reshape(nbc * lbmax, sub, 128),
                jnp.full((nbc, sub, 128), LEN, jnp.int32))

    place = jax.jit(
        lambda buf, part, i: jax.lax.dynamic_update_slice(
            buf, part, (i * nbc * lbmax, 0, 0)), donate_argnums=0)
    btd = jnp.zeros((nbk * lbmax, sub, 128), jnp.int32)
    ltd = jnp.full((nbk, sub, 128), LEN, jnp.int32)
    for i in range(nbk // nbc):
        part, _ = build(jax.random.PRNGKey(17 + i))
        btd = place(btd, part, i)
        del part
    btd = jax.block_until_ready(btd)
    stq = dk.stage_query_seq(query)

    def rate(fn):
        out = fn()
        np.asarray(out[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn()
            for _ in range(4):
                o = fn()
            np.asarray(o[:1])
            best = min(best, (time.perf_counter() - t0) / 5)
        return Bd / best

    r_full = rate(lambda: dk.damerau_seq_1v_many(
        None, btd, ltd, lbmax=lbmax, staged=stq))
    print(json.dumps({"kernel": "full", "pairs_per_s": round(r_full)}),
          flush=True)
    for kb in dk.DAM_BAND_BUCKETS:
        r = rate(lambda: dk.damerau_seqband_1v_many(
            None, btd, ltd, lbmax=lbmax, kband=kb, staged=stq))
        print(json.dumps({"kernel": f"band_k{kb}", "W": 2 * kb + 1,
                          "pairs_per_s": round(r),
                          "x_full": round(r / r_full, 2)}), flush=True)


if __name__ == "__main__":
    main()
