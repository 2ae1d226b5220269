"""Which int16 vector ops does Mosaic lower on this chip?

Round 3's int16 sequential-pair Damerau body compiles in interpret mode
but v5e Mosaic rejected its vector compares ("Target does not support
this comparison", arith.cmpi on vector<8x128x2xi16>).  Before rebuilding
the kernel around that limit, this probe compiles one tiny Pallas kernel
per op class on the real chip and reports OK/FAIL per op:

  add/sub, and/or/xor/not, shifts (arith mask trick), multiply,
  cmpi eq / ne / slt / sge, select on an i16-layout mask,
  jnp.minimum / maximum, widen+compare+narrow round trip.

The arith-mask trick (m = (d | -d) >> 15 etc.) needs only add/sub/or/
neg/shift — if those pass while cmpi fails, the i16 kernel can replace
every compare/select/min with mask algebra.

Run:  python experiments/i16_ops_probe.py   (needs the TPU tunnel)
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I16 = jnp.int16
# (16, 128) is the layout the shipped _kernel_sq16* bodies use (sublane x
# lane; Mosaic packs two i16 per 32-bit lane internally).  (8, 128, 2) is
# the literal shape from the r3 error message — but as a Pallas array its
# LANE dim is 2, an unrepresentative tiling whose failures may be layout
# artifacts, so both are probed (run with an argv shape like "16,128").
SHAPE = (16, 128)


def run_case(name, body, check=None):
    def kern(x_ref, y_ref, o_ref):
        o_ref[...] = body(x_ref[...], y_ref[...])

    x = (np.arange(np.prod(SHAPE), dtype=np.int16) % 97).reshape(SHAPE)
    y = ((np.arange(np.prod(SHAPE), dtype=np.int16) * 7 + 3) % 89
         ).reshape(SHAPE).astype(np.int16)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int16),
        )(jnp.asarray(x), jnp.asarray(y))
        out = np.asarray(jax.block_until_ready(out))
        if check is not None:
            exp = check(x.astype(np.int64), y.astype(np.int64))
            ok = np.array_equal(out.astype(np.int64),
                                exp.astype(np.int64) & 0xFFFF
                                | np.where(exp < 0, -65536, 0))
            ok = np.array_equal(out, exp.astype(np.int16))
            print(f"OK   {name}" + ("" if ok else "  (WRONG VALUES)"))
        else:
            print(f"OK   {name}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        print(f"FAIL {name}: {msg}")


def main():
    global SHAPE
    if len(sys.argv) > 1:
        SHAPE = tuple(int(v) for v in sys.argv[1].split(","))
    print(f"device: {jax.devices()[0]}  shape: {SHAPE}")
    run_case("add", lambda x, y: x + y, lambda x, y: x + y)
    run_case("sub", lambda x, y: x - y, lambda x, y: x - y)
    run_case("and", lambda x, y: x & y, lambda x, y: x & y)
    run_case("or", lambda x, y: x | y, lambda x, y: x | y)
    run_case("xor", lambda x, y: x ^ y, lambda x, y: x ^ y)
    run_case("not", lambda x, y: ~x, lambda x, y: ~x)
    run_case("neg", lambda x, y: -x, lambda x, y: -x)
    run_case("shr15", lambda x, y: (x - y) >> I16(15),
             lambda x, y: (x - y) >> 15)
    run_case("shl1", lambda x, y: x << I16(1), lambda x, y: (x << 1))
    run_case("mul", lambda x, y: x * y, lambda x, y: x * y)
    # NOTE: where(x == y, x, y) canonicalizes to y — the compare never
    # reaches Mosaic and the case "passes" vacuously (this probe's first
    # run reported eq/ne OK that way; the real kernel then failed on
    # arith.cmpi eq).  The +3 arm makes every select non-foldable.
    run_case("cmpi_eq+select", lambda x, y: jnp.where(x == y, y + I16(3), y),
             lambda x, y: np.where(x == y, y + 3, y))
    run_case("cmpi_ne+select", lambda x, y: jnp.where(x != y, y + I16(3), y),
             lambda x, y: np.where(x != y, y + 3, y))
    run_case("cmpi_slt+select", lambda x, y: jnp.where(x < y, y + I16(3), y),
             lambda x, y: np.where(x < y, y + 3, y))
    run_case("cmpi_sge+select", lambda x, y: jnp.where(x >= y, y + I16(3), y),
             lambda x, y: np.where(x >= y, y + 3, y))
    run_case("minimum", lambda x, y: jnp.minimum(x, y),
             lambda x, y: np.minimum(x, y))
    run_case("maximum", lambda x, y: jnp.maximum(x, y),
             lambda x, y: np.maximum(x, y))
    # mask algebra replacements (no cmpi): eq/lt masks + select + min
    def eq_mask(x, y):
        d = x - y
        return ~((d | -d) >> I16(15))          # -1 where equal, else 0

    def lt_mask(x, y):                         # valid for |x|,|y| < 2^14
        return (x - y) >> I16(15)              # -1 where x < y

    run_case("mask_eq_select",
             lambda x, y: y ^ ((x ^ y) & eq_mask(x, y)),
             lambda x, y: np.where(x == y, x, y))
    run_case("mask_min",
             lambda x, y: y ^ ((x ^ y) & lt_mask(x, y)),
             lambda x, y: np.minimum(x, y))
    # widened compares: do the cmp in i32 on widened operands, narrow back
    run_case("widen_cmp_narrow",
             lambda x, y: jnp.where(
                 x.astype(jnp.int32) == y.astype(jnp.int32),
                 jnp.int32(1), jnp.int32(0)).astype(I16),
             lambda x, y: (x == y).astype(np.int16))
    # i32 mask driving an i16 select (the r3 "Invalid relayout" suspect);
    # non-foldable arms (see note above)
    run_case("i32mask_i16_select",
             lambda x, y: jnp.where(
                 x.astype(jnp.int32) == y.astype(jnp.int32),
                 y + I16(3), y),
             lambda x, y: np.where(x == y, y + 3, y))


if __name__ == "__main__":
    main()
