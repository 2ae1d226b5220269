"""Indel distance (``/root/reference/src/distance/indel.rs``).

Pure reduction over LCS: ``maximum = len1 + len2``;
``distance = maximum - 2 * lcs_similarity`` (``indel.rs:62-104``).
"""

from __future__ import annotations

import numpy as np

from .. import oracle as _oracle
from ..ops import dispatch as _dispatch
from ..ops import lcs as _ops
from . import _int_metric


def _maximum(l1, l2):
    return l1 + l2


def _raw_distance(u1, u2):
    return _oracle.indel(u1, u2)


def _batch_distance(c1, l1, c2, l2):
    sim = _dispatch.run_pairs(_ops.lcs_similarity, c1, l1, c2, l2)
    B = max(len(l1), len(l2))
    tot = (np.broadcast_to(l1, (B,)).astype(np.int64)
           + np.broadcast_to(l2, (B,)).astype(np.int64))
    return tot - 2 * sim.astype(np.int64)


def _fast_distance(s1, s2):
    fast = _oracle.fast_scalar()
    return None if fast is None else fast.int_metric(0, s1, s2)


METRIC = _int_metric.IntMetric("indel", _maximum, _raw_distance,
                               _batch_distance,
                               fast_distance=_fast_distance)
_int_metric.build_module(METRIC, globals(), example=("lewenstein", "levenshtein", 3))


def editops(s1, s2):
    """Insert/delete-only edit script from the LCS alignment
    (``len(editops) == indel.distance``).

    >>> from rapidfuzz_tpu.distance import indel
    >>> [(o.tag, o.src_pos, o.dest_pos)
    ...  for o in indel.editops("lewenstein", "levenshtein")]  # doctest: +NORMALIZE_WHITESPACE
    [('insert', 2, 2), ('delete', 2, 3), ('insert', 6, 6)]
    """
    from ._editops import indel_editops
    return indel_editops(s1, s2)


def editops_many(s1, choices):
    """Indel edit scripts from ``s1`` to every choice, one batched
    recording dispatch (``list[Editops]``).

    >>> from rapidfuzz_tpu.distance import indel
    >>> [len(o) for o in indel.editops_many("ab", ["abc", "b"])]
    [1, 1]
    """
    from ._editops import indel_editops_many
    return indel_editops_many(s1, choices)


def opcodes(s1, s2):
    """difflib-style grouped edit operations for the LCS alignment."""
    return editops(s1, s2).as_opcodes()


__all__ += ["editops", "opcodes", "editops_many"]
