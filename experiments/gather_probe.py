"""Probe: does tpu.dynamic_gather lower for u32 lane-wise table lookups?"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(table_ref, idx_ref, out_ref):
    # table_ref: [8, 128] u32 (every sublane = same 128-entry table)
    # idx_ref:   [8, 128] i32 indices in [0, 128)
    # out[i, j] = table[i, idx[i, j]]
    out_ref[:, :] = jnp.take_along_axis(table_ref[:, :], idx_ref[:, :], axis=1)


@jax.jit
def run(table, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def main():
    rng = np.random.default_rng(0)
    for dtype in (np.uint32, np.int32, np.float32):
        table_row = (rng.integers(0, 2**31, 128)).astype(dtype)
        table = np.broadcast_to(table_row, (8, 128)).copy()
        idx = rng.integers(0, 128, (8, 128)).astype(np.int32)
        try:
            out = np.asarray(run(table, idx))
            exp = table_row[idx]
            ok = np.array_equal(out, exp)
            print(f"{np.dtype(dtype).name}: lowered, correct={ok}", flush=True)
        except Exception as e:
            print(f"{np.dtype(dtype).name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
