"""Longest common subsequence (``/root/reference/src/distance/lcs_seq.rs``).

``maximum = max(len1, len2)`` (``lcs_seq.rs:549-551``); the primitive is the
similarity (LCS length), distance derives as ``maximum - similarity``.
"""

from __future__ import annotations

import numpy as np

from .. import oracle as _oracle
from ..ops import dispatch as _dispatch
from ..ops import lcs as _ops
from . import _int_metric


def _maximum(l1, l2):
    return np.maximum(l1, l2) if isinstance(l1, np.ndarray) else max(l1, l2)


def _raw_distance(u1, u2):
    return max(u1.size, u2.size) - _oracle.lcs_seq(u1, u2)


def _batch_distance(c1, l1, c2, l2):
    sim = _dispatch.run_pairs(_ops.lcs_similarity, c1, l1, c2, l2)
    B = max(len(l1), len(l2))
    mx = np.maximum(np.broadcast_to(l1, (B,)), np.broadcast_to(l2, (B,)))
    return mx.astype(np.int64) - sim.astype(np.int64)


def _fast_distance(s1, s2):
    fast = _oracle.fast_scalar()
    if fast is None:
        return None
    sim = fast.int_metric(1, s1, s2)
    return None if sim is None else max(len(s1), len(s2)) - sim


METRIC = _int_metric.IntMetric("lcs_seq", _maximum, _raw_distance,
                               _batch_distance,
                               fast_distance=_fast_distance)
_int_metric.build_module(METRIC, globals(), example=("lewenstein", "levenshtein", 2))


def similarity_batch_raw(c1, l1, c2, l2):
    """Raw LCS lengths for pre-encoded batches (used by indel/fuzz)."""
    return _dispatch.run_pairs(_ops.lcs_similarity, c1, l1, c2, l2)


def editops(s1, s2):
    """Insert/delete-only edit script from the LCS alignment (shared with
    ``indel.editops`` — the two metrics score the same alignment,
    ``indel.rs:62-104``).

    >>> from rapidfuzz_tpu.distance import lcs_seq
    >>> ops = lcs_seq.editops("lewenstein", "levenshtein")
    >>> ops.apply("lewenstein", "levenshtein")
    'levenshtein'
    """
    from ._editops import lcs_editops
    return lcs_editops(s1, s2)


def editops_many(s1, choices):
    """LCS edit scripts from ``s1`` to every choice, one batched recording
    dispatch (``list[Editops]``).

    >>> from rapidfuzz_tpu.distance import lcs_seq
    >>> [len(o) for o in lcs_seq.editops_many("ab", ["abc", "b"])]
    [1, 1]
    """
    from ._editops import lcs_editops_many
    return lcs_editops_many(s1, choices)


def opcodes(s1, s2):
    """difflib-style grouped edit operations for the LCS alignment."""
    return editops(s1, s2).as_opcodes()


__all__ += ["editops", "opcodes", "editops_many"]
