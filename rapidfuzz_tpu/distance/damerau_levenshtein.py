"""Unrestricted Damerau-Levenshtein distance
(``/root/reference/src/distance/damerau_levenshtein.rs``).
``maximum = max(len1, len2)`` (``damerau_levenshtein.rs:193-195``).
"""

from __future__ import annotations

import numpy as np

from .. import oracle as _oracle
from ..ops import damerau as _ops
from ..ops import dispatch as _dispatch
from . import _int_metric


def _maximum(l1, l2):
    return np.maximum(l1, l2) if isinstance(l1, np.ndarray) else max(l1, l2)


def _raw_distance(u1, u2):
    return _oracle.damerau(u1, u2)


def _batch_distance(c1, l1, c2, l2):
    return _dispatch.run_pairs(_ops.damerau_distance, c1, l1, c2, l2)


def _fast_distance(s1, s2):
    fast = _oracle.fast_scalar()
    return None if fast is None else fast.int_metric(3, s1, s2)


METRIC = _int_metric.IntMetric("damerau_levenshtein", _maximum,
                               _raw_distance, _batch_distance,
                               fast_distance=_fast_distance)
_int_metric.build_module(METRIC, globals(), example=("CA", "ABC", 2))
