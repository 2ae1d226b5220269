"""Factory for integer-valued metric modules.

Every reference metric module exposes the same 10-function surface
(SURVEY.md §2.2); this builds it from three ingredients: ``maximum``,
a scalar raw-distance function (host oracle), and a batched raw-distance
function (device kernels), with cutoff algebra from ``common.py``.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .. import common as _c
from ..ops import dispatch as _dispatch
from ..utils import codec as _codec


class IntMetric:
    """Bundle of the derived API functions for one integer metric."""

    def __init__(self, name: str,
                 maximum: Callable[[int, int], int],
                 raw_distance: Callable[[np.ndarray, np.ndarray], int],
                 batch_distance: Callable[..., np.ndarray]):
        self.name = name
        self.maximum = maximum
        self.raw_distance = raw_distance
        self.batch_distance = batch_distance

    # ------------------------------------------------------------- scalar
    def _scalar(self, s1, s2):
        u1, u2 = _codec.encode_one(s1), _codec.encode_one(s2)
        mx = self.maximum(u1.size, u2.size)
        if _c.scalar_backend() == "device":
            c1, l1, c2, l2 = _codec.encode_pair_batch([u1], [u2])
            return int(np.asarray(self.batch_distance(c1, l1, c2, l2))[0]), mx
        return self.raw_distance(u1, u2), mx

    def distance(self, s1, s2, *, score_cutoff=None, score_hint=None):
        dist, _ = self._scalar(s1, s2)
        return _c.apply_distance_cutoff(dist, score_cutoff)

    def similarity(self, s1, s2, *, score_cutoff=None, score_hint=None):
        dist, mx = self._scalar(s1, s2)
        return _c.apply_similarity_cutoff(mx - dist, score_cutoff)

    def normalized_distance(self, s1, s2, *, score_cutoff=None,
                            score_hint=None):
        dist, mx = self._scalar(s1, s2)
        return _c.apply_distance_cutoff(_c.norm_dist_from_dist(dist, mx),
                                        score_cutoff)

    def normalized_similarity(self, s1, s2, *, score_cutoff=None,
                              score_hint=None):
        dist, mx = self._scalar(s1, s2)
        return _c.apply_similarity_cutoff(
            1.0 - _c.norm_dist_from_dist(dist, mx), score_cutoff)

    # -------------------------------------------------------------- batch
    def _batch_raw(self, s1s, s2s):
        c1, l1, c2, l2 = _codec.encode_pair_batch(s1s, s2s)
        dist = self.batch_distance(c1, l1, c2, l2)
        B = max(len(l1), len(l2))
        l1b = np.broadcast_to(l1, (B,)).astype(np.int64)
        l2b = np.broadcast_to(l2, (B,)).astype(np.int64)
        mx = self.maximum(l1b, l2b)
        return np.asarray(dist, np.int64), mx

    def distance_many(self, s1s, s2s, *, score_cutoff=None):
        dist, _ = self._batch_raw(s1s, s2s)
        return _dispatch.BatchResult(*_c.mask_distance(dist, score_cutoff))

    def similarity_many(self, s1s, s2s, *, score_cutoff=None):
        dist, mx = self._batch_raw(s1s, s2s)
        return _dispatch.BatchResult(*_c.mask_similarity(mx - dist,
                                                         score_cutoff))

    def normalized_distance_many(self, s1s, s2s, *, score_cutoff=None):
        dist, mx = self._batch_raw(s1s, s2s)
        nd = np.where(mx == 0, 0.0, dist / np.maximum(mx, 1))
        return _dispatch.BatchResult(*_c.mask_distance(nd, score_cutoff))

    def normalized_similarity_many(self, s1s, s2s, *, score_cutoff=None):
        dist, mx = self._batch_raw(s1s, s2s)
        ns = 1.0 - np.where(mx == 0, 0.0, dist / np.maximum(mx, 1))
        return _dispatch.BatchResult(*_c.mask_similarity(ns, score_cutoff))


def build_module(metric: IntMetric, ns: dict, extra_args_slots=()):
    """Install the standard public surface into a module namespace."""

    class Args(_c.ArgsBase):
        __slots__ = ()

    Args.__qualname__ = f"{metric.name}.Args"

    def distance(s1, s2, *, score_cutoff=None, score_hint=None):
        return metric.distance(s1, s2, score_cutoff=score_cutoff)

    def similarity(s1, s2, *, score_cutoff=None, score_hint=None):
        return metric.similarity(s1, s2, score_cutoff=score_cutoff)

    def normalized_distance(s1, s2, *, score_cutoff=None, score_hint=None):
        return metric.normalized_distance(s1, s2, score_cutoff=score_cutoff)

    def normalized_similarity(s1, s2, *, score_cutoff=None, score_hint=None):
        return metric.normalized_similarity(s1, s2, score_cutoff=score_cutoff)

    def distance_with_args(s1, s2, args):
        return metric.distance(s1, s2, score_cutoff=args.cutoff)

    def similarity_with_args(s1, s2, args):
        return metric.similarity(s1, s2, score_cutoff=args.cutoff)

    def normalized_distance_with_args(s1, s2, args):
        return metric.normalized_distance(s1, s2, score_cutoff=args.cutoff)

    def normalized_similarity_with_args(s1, s2, args):
        return metric.normalized_similarity(s1, s2, score_cutoff=args.cutoff)

    class BatchComparator:
        """One-vs-many comparator with device batch APIs."""

        def __init__(self, s1):
            self._u1 = _codec.encode_one(s1)

        def distance(self, s2, **kw):
            return metric.distance(self._u1, s2, **kw)

        def similarity(self, s2, **kw):
            return metric.similarity(self._u1, s2, **kw)

        def normalized_distance(self, s2, **kw):
            return metric.normalized_distance(self._u1, s2, **kw)

        def normalized_similarity(self, s2, **kw):
            return metric.normalized_similarity(self._u1, s2, **kw)

        def distance_with_args(self, s2, args):
            return metric.distance(self._u1, s2, score_cutoff=args.cutoff)

        def similarity_with_args(self, s2, args):
            return metric.similarity(self._u1, s2, score_cutoff=args.cutoff)

        def normalized_distance_with_args(self, s2, args):
            return metric.normalized_distance(self._u1, s2,
                                              score_cutoff=args.cutoff)

        def normalized_similarity_with_args(self, s2, args):
            return metric.normalized_similarity(self._u1, s2,
                                                score_cutoff=args.cutoff)

        def distances(self, corpus, *, score_cutoff=None):
            return metric.distance_many([self._u1], corpus,
                                        score_cutoff=score_cutoff)

        def similarities(self, corpus, *, score_cutoff=None):
            return metric.similarity_many([self._u1], corpus,
                                          score_cutoff=score_cutoff)

        def normalized_distances(self, corpus, *, score_cutoff=None):
            return metric.normalized_distance_many(
                [self._u1], corpus, score_cutoff=score_cutoff)

        def normalized_similarities(self, corpus, *, score_cutoff=None):
            return metric.normalized_similarity_many(
                [self._u1], corpus, score_cutoff=score_cutoff)

    BatchComparator.__qualname__ = f"{metric.name}.BatchComparator"

    ns.update(
        Args=Args,
        distance=distance,
        similarity=similarity,
        normalized_distance=normalized_distance,
        normalized_similarity=normalized_similarity,
        distance_with_args=distance_with_args,
        similarity_with_args=similarity_with_args,
        normalized_distance_with_args=normalized_distance_with_args,
        normalized_similarity_with_args=normalized_similarity_with_args,
        BatchComparator=BatchComparator,
        distance_many=metric.distance_many,
        similarity_many=metric.similarity_many,
        normalized_distance_many=metric.normalized_distance_many,
        normalized_similarity_many=metric.normalized_similarity_many,
        maximum=metric.maximum,
    )
    ns.setdefault("__all__", [
        "Args", "distance", "similarity", "normalized_distance",
        "normalized_similarity", "distance_with_args", "similarity_with_args",
        "normalized_distance_with_args", "normalized_similarity_with_args",
        "BatchComparator", "distance_many", "similarity_many",
        "normalized_distance_many", "normalized_similarity_many", "maximum",
    ])
