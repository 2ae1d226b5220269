"""Prefix metric (``/root/reference/src/distance/prefix.rs``):
similarity = common prefix length; ``maximum = max(len1, len2)``.
"""

from __future__ import annotations

import numpy as np

from .. import oracle as _oracle
from ..ops import dispatch as _dispatch
from ..ops import simple as _ops
from . import _int_metric


def _maximum(l1, l2):
    return np.maximum(l1, l2) if isinstance(l1, np.ndarray) else max(l1, l2)


def _raw_distance(u1, u2):
    return max(u1.size, u2.size) - _oracle.prefix_sim(u1, u2)


def _batch_distance(c1, l1, c2, l2):
    sim = _dispatch.run_pairs(_ops.prefix_similarity, c1, l1, c2, l2)
    B = max(len(l1), len(l2))
    mx = np.maximum(np.broadcast_to(l1, (B,)), np.broadcast_to(l2, (B,)))
    return mx.astype(np.int64) - sim.astype(np.int64)


def _fast_distance(s1, s2):
    fast = _oracle.fast_scalar()
    if fast is None:
        return None
    sim = fast.int_metric(5, s1, s2)
    return None if sim is None else max(len(s1), len(s2)) - sim


METRIC = _int_metric.IntMetric("prefix", _maximum, _raw_distance,
                               _batch_distance,
                               fast_distance=_fast_distance)
_int_metric.build_module(METRIC, globals(), example=("prefix", "pre", 3))
