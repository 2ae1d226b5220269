"""Hamming distance (``/root/reference/src/distance/hamming.rs``).

``maximum = max(len1, len2)``; without ``pad=True`` unequal lengths raise
``DifferentLengthArgsError`` (the Python rendering of
``Error::DifferentLengthArgs``, ``hamming.rs:121-136``); with padding the
overhang counts one mismatch per element (``hamming.rs:138-161``).
"""

from __future__ import annotations

import numpy as np

from .. import common as _c
from .. import oracle as _oracle
from ..ops import dispatch as _dispatch
from ..ops import simple as _ops
from ..utils import codec as _codec


class DifferentLengthArgsError(ValueError):
    """Raised when lengths differ and padding is disabled."""

    def __init__(self):
        super().__init__("Differing length arguments provided")


class Args(_c.ArgsBase):
    __slots__ = ("pad_",)

    def __init__(self):
        super().__init__()
        self.pad_ = False

    def pad(self, value: bool):
        new = self._copy()
        new.pad_ = value
        return new


def maximum(len1, len2):
    return np.maximum(len1, len2) if isinstance(len1, np.ndarray) \
        else max(len1, len2)


def _scalar(s1, s2, pad):
    if type(s1) in (str, bytes) and type(s2) in (str, bytes):
        if not pad and len(s1) != len(s2):
            raise DifferentLengthArgsError()
        fast = _oracle.fast_scalar()
        if fast is not None:            # in-process C one-shot path
            return fast.int_metric(4, s1, s2), max(len(s1), len(s2))
    u1, u2 = _codec.encode_one(s1), _codec.encode_one(s2)
    if not pad and u1.size != u2.size:
        raise DifferentLengthArgsError()
    return _oracle.hamming(u1, u2), maximum(u1.size, u2.size)


def distance(s1, s2, *, pad=False, score_cutoff=None, score_hint=None):
    """Hamming distance; unequal lengths raise unless ``pad=True``.

    >>> from rapidfuzz_tpu.distance import hamming
    >>> hamming.distance("karolin", "kathrin")
    3
    >>> hamming.distance("karolin", "kath", pad=True)
    5
    >>> hamming.distance("ab", "abc")
    Traceback (most recent call last):
        ...
    rapidfuzz_tpu.distance.hamming.DifferentLengthArgsError: Differing length arguments provided
    """
    dist, _ = _scalar(s1, s2, pad)
    return _c.apply_distance_cutoff(dist, score_cutoff)


def similarity(s1, s2, *, pad=False, score_cutoff=None, score_hint=None):
    """Hamming similarity (``maximum - distance``).

    >>> from rapidfuzz_tpu.distance import hamming
    >>> hamming.similarity("karolin", "kathrin")
    4
    """
    dist, mx = _scalar(s1, s2, pad)
    return _c.apply_similarity_cutoff(mx - dist, score_cutoff)


def normalized_distance(s1, s2, *, pad=False, score_cutoff=None,
                        score_hint=None):
    dist, mx = _scalar(s1, s2, pad)
    return _c.apply_distance_cutoff(_c.norm_dist_from_dist(dist, mx),
                                    score_cutoff)


def normalized_similarity(s1, s2, *, pad=False, score_cutoff=None,
                          score_hint=None):
    dist, mx = _scalar(s1, s2, pad)
    return _c.apply_similarity_cutoff(1.0 - _c.norm_dist_from_dist(dist, mx),
                                      score_cutoff)


def distance_with_args(s1, s2, args: Args):
    return distance(s1, s2, pad=args.pad_, score_cutoff=args.cutoff)


def similarity_with_args(s1, s2, args: Args):
    return similarity(s1, s2, pad=args.pad_, score_cutoff=args.cutoff)


def normalized_distance_with_args(s1, s2, args: Args):
    return normalized_distance(s1, s2, pad=args.pad_, score_cutoff=args.cutoff)


def normalized_similarity_with_args(s1, s2, args: Args):
    return normalized_similarity(s1, s2, pad=args.pad_,
                                 score_cutoff=args.cutoff)


def _batch_raw(s1s, s2s, pad):
    c1, l1, c2, l2 = _codec.encode_pair_batch(s1s, s2s)
    B = max(len(l1), len(l2))
    l1b = np.broadcast_to(l1, (B,)).astype(np.int64)
    l2b = np.broadcast_to(l2, (B,)).astype(np.int64)
    if not pad and np.any(l1b != l2b):
        raise DifferentLengthArgsError()
    dist = _dispatch.run_pairs(_ops.hamming_distance, c1, l1, c2, l2)
    return dist.astype(np.int64), np.maximum(l1b, l2b)


def distance_many(s1s, s2s, *, pad=False, score_cutoff=None
                  ) -> _dispatch.BatchResult:
    dist, _ = _batch_raw(s1s, s2s, pad)
    return _dispatch.BatchResult(*_c.mask_distance(dist, score_cutoff))


def similarity_many(s1s, s2s, *, pad=False, score_cutoff=None
                    ) -> _dispatch.BatchResult:
    dist, mx = _batch_raw(s1s, s2s, pad)
    return _dispatch.BatchResult(*_c.mask_similarity(mx - dist, score_cutoff))


def normalized_distance_many(s1s, s2s, *, pad=False, score_cutoff=None
                             ) -> _dispatch.BatchResult:
    dist, mx = _batch_raw(s1s, s2s, pad)
    nd = np.where(mx == 0, 0.0, dist / np.maximum(mx, 1))
    return _dispatch.BatchResult(*_c.mask_distance(nd, score_cutoff))


def normalized_similarity_many(s1s, s2s, *, pad=False, score_cutoff=None
                               ) -> _dispatch.BatchResult:
    dist, mx = _batch_raw(s1s, s2s, pad)
    ns = 1.0 - np.where(mx == 0, 0.0, dist / np.maximum(mx, 1))
    return _dispatch.BatchResult(*_c.mask_similarity(ns, score_cutoff))


class BatchComparator:
    def __init__(self, s1):
        self._u1 = _codec.encode_one(s1)

    def distance(self, s2, **kw):
        return distance(self._u1, s2, **kw)

    def similarity(self, s2, **kw):
        return similarity(self._u1, s2, **kw)

    def normalized_distance(self, s2, **kw):
        return normalized_distance(self._u1, s2, **kw)

    def normalized_similarity(self, s2, **kw):
        return normalized_similarity(self._u1, s2, **kw)

    def distance_with_args(self, s2, args: Args):
        return distance_with_args(self._u1, s2, args)

    def similarity_with_args(self, s2, args: Args):
        return similarity_with_args(self._u1, s2, args)

    def normalized_distance_with_args(self, s2, args: Args):
        return normalized_distance_with_args(self._u1, s2, args)

    def normalized_similarity_with_args(self, s2, args: Args):
        return normalized_similarity_with_args(self._u1, s2, args)

    def distances(self, corpus, *, pad=False, score_cutoff=None):
        return distance_many([self._u1], corpus, pad=pad,
                             score_cutoff=score_cutoff)

    def similarities(self, corpus, *, pad=False, score_cutoff=None):
        return similarity_many([self._u1], corpus, pad=pad,
                               score_cutoff=score_cutoff)

    def normalized_distances(self, corpus, *, pad=False, score_cutoff=None):
        return normalized_distance_many([self._u1], corpus, pad=pad,
                                        score_cutoff=score_cutoff)

    def normalized_similarities(self, corpus, *, pad=False,
                                score_cutoff=None):
        return normalized_similarity_many([self._u1], corpus, pad=pad,
                                          score_cutoff=score_cutoff)


# C vectorcall entry points (native/rf_scalar.cpp FastMetric, id 4):
# equal-length str/bytes calls — the only class the default pad=False
# accepts — run without Python frames; unequal lengths and pad= keywords
# fall back to the closures above (which raise or pad per
# hamming.rs:121-161).
_mkfn = getattr(_oracle.fast_scalar(), "make_metric_fn", None)
if _mkfn is not None:
    __test__ = {}

    def _cwrap(fn, kind):
        w = _mkfn(4, kind, 0, fn)
        w.__doc__ = fn.__doc__
        w.__name__ = fn.__name__
        w.__qualname__ = fn.__qualname__
        w.__module__ = fn.__module__
        if fn.__doc__:
            __test__[f"hamming.{fn.__name__}"] = fn.__doc__
        return w

    distance = _cwrap(distance, 0)
    similarity = _cwrap(similarity, 1)
    normalized_distance = _cwrap(normalized_distance, 2)
    normalized_similarity = _cwrap(normalized_similarity, 3)
    del _cwrap
