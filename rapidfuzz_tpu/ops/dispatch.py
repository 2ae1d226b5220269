"""Device dispatch: jitted kernel entry points + bucketed batch execution.

JAX caches compilations per input shape; the codec's length buckets
(``utils/codec.py``) bound the number of distinct shapes, replacing the
reference's run-time kernel ladder with trace-time bucket selection
(SURVEY.md §7 design stance).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np


class BatchResult(NamedTuple):
    """Batch score result: ``values`` plus a ``valid`` mask.

    The mask is the batch equivalent of the reference's ``Option<T>``
    results under ``WithScoreCutoff`` (``src/common.rs:33-46``).
    """
    values: np.ndarray
    valid: np.ndarray

    def tolist(self):
        return [v if ok else None
                for v, ok in zip(self.values.tolist(), self.valid.tolist())]


@functools.cache
def jit_kernel(fn, *static_kv):
    """jit with keyword static args, cached per (fn, statics)."""
    statics = dict(static_kv)
    if statics:
        return jax.jit(functools.partial(fn, **statics))
    return jax.jit(fn)


def run_pairs(kernel, c1, l1, c2, l2, **static) -> np.ndarray:
    """Execute a batched pair kernel on device, return numpy."""
    fn = jit_kernel(kernel, *sorted(static.items()))
    out = fn(c1, l1, c2, l2)
    return np.asarray(jax.device_get(out))
