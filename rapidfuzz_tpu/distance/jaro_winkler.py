"""Jaro-Winkler similarity (``/root/reference/src/distance/jaro_winkler.rs``).

Wrapper over Jaro: common prefix capped at 4, boost
``sim += prefix * prefix_weight * (1 - sim)`` only when the Jaro similarity
exceeds 0.7 (``jaro_winkler.rs:64-101``).  Default ``prefix_weight`` 0.1.
"""

from __future__ import annotations

import numpy as np

from .. import common as _c
from .. import oracle as _oracle
from ..ops import dispatch as _dispatch
from ..ops import jaro as _ops
from ..utils import codec as _codec
from . import jaro as _jaro


class Args(_c.ArgsBase):
    __slots__ = ("prefix_weight_",)

    def __init__(self):
        super().__init__()
        self.prefix_weight_ = 0.1

    def prefix_weight(self, w: float):
        new = self._copy()
        new.prefix_weight_ = w
        return new


def maximum(len1=None, len2=None) -> float:
    return 1.0


def _sim_scalar(s1, s2, prefix_weight) -> float:
    if type(s1) in (str, bytes) and type(s2) in (str, bytes):
        fast = _oracle.fast_scalar()
        if fast is not None:
            return fast.jaro_winkler(s1, s2, float(prefix_weight))
    u1, u2 = _codec.encode_one(s1), _codec.encode_one(s2)
    return _oracle.jaro_winkler(u1, u2, prefix_weight)


def similarity(s1, s2, *, prefix_weight=0.1, score_cutoff=None,
               score_hint=None):
    """Jaro-Winkler similarity (prefix-boosted Jaro).

    >>> from rapidfuzz_tpu.distance import jaro_winkler
    >>> round(jaro_winkler.similarity("martha", "marhta"), 4)
    0.9611
    >>> round(jaro_winkler.similarity("martha", "marhta",
    ...                               prefix_weight=0.2), 4)
    0.9778
    """
    return _c.apply_similarity_cutoff(_sim_scalar(s1, s2, prefix_weight),
                                      score_cutoff)


def distance(s1, s2, *, prefix_weight=0.1, score_cutoff=None,
             score_hint=None):
    return _c.apply_distance_cutoff(1.0 - _sim_scalar(s1, s2, prefix_weight),
                                    score_cutoff)


def normalized_similarity(s1, s2, **kw):
    return similarity(s1, s2, **kw)


def normalized_distance(s1, s2, **kw):
    return distance(s1, s2, **kw)


def similarity_with_args(s1, s2, args: Args):
    return similarity(s1, s2, prefix_weight=args.prefix_weight_,
                      score_cutoff=args.cutoff)


def distance_with_args(s1, s2, args: Args):
    return distance(s1, s2, prefix_weight=args.prefix_weight_,
                    score_cutoff=args.cutoff)


def normalized_similarity_with_args(s1, s2, args: Args):
    return similarity_with_args(s1, s2, args)


def normalized_distance_with_args(s1, s2, args: Args):
    return distance_with_args(s1, s2, args)


def _sim_batch(s1s, s2s, prefix_weight) -> np.ndarray:
    from . import _int_metric
    if len(s1s) == 1 and len(s2s) >= _int_metric.SCAN_MIN:
        # Pallas corpus scan for large one-vs-many batches (see
        # jaro._sim_batch for the sub-0.5 ulp note)
        d = _int_metric.scan_one_vs_many("jaro_winkler", s1s[0], s2s,
                                         prefix_weight=prefix_weight)
        if d is not None:
            return 1.0 - d
    c1, l1, c2, l2 = _codec.encode_pair_batch(s1s, s2s)
    fn = _dispatch.jit_kernel(_ops.jaro_components)
    common, trans = (np.asarray(x) for x in fn(c1, l1, c2, l2))
    B = common.shape[0]
    l1b = np.broadcast_to(l1, (B,))
    l2b = np.broadcast_to(l2, (B,))
    sim = _jaro.sim_from_components(common, trans, l1b, l2b)
    # prefix capped at 4 on the original strings (jaro_winkler.rs:78-83)
    P = min(4, c1.shape[-1], c2.shape[-1])
    c1b = np.broadcast_to(c1, (B, c1.shape[-1]))
    c2b = np.broadcast_to(c2, (B, c2.shape[-1]))
    pe = (c1b[:, :P] == c2b[:, :P]) & \
         (np.arange(P) < np.minimum(l1b, l2b)[:, None])
    prefix = np.cumprod(pe.astype(np.int64), axis=-1).sum(-1)
    boosted = sim + prefix * prefix_weight * (1.0 - sim)
    return np.where(sim > 0.7, boosted, sim)


def similarity_many(s1s, s2s, *, prefix_weight=0.1, score_cutoff=None
                    ) -> _dispatch.BatchResult:
    return _dispatch.BatchResult(
        *_c.mask_similarity(_sim_batch(s1s, s2s, prefix_weight), score_cutoff))


def distance_many(s1s, s2s, *, prefix_weight=0.1, score_cutoff=None
                  ) -> _dispatch.BatchResult:
    return _dispatch.BatchResult(
        *_c.mask_distance(1.0 - _sim_batch(s1s, s2s, prefix_weight),
                          score_cutoff))


normalized_similarity_many = similarity_many
normalized_distance_many = distance_many


class BatchComparator:
    def __init__(self, s1, prefix_weight: float = 0.1):
        # keep str/bytes queries for the C one-shot route (the
        # reference's BatchComparator is its fastest scalar path)
        self._s1 = s1 if type(s1) in (str, bytes) else None
        self._u1 = _codec.encode_one(s1)
        self._pw = prefix_weight

    def _q(self, s2):
        return (self._s1 if self._s1 is not None
                and type(s2) in (str, bytes) else self._u1)

    def similarity(self, s2, **kw):
        kw.setdefault("prefix_weight", self._pw)
        return similarity(self._q(s2), s2, **kw)

    def distance(self, s2, **kw):
        kw.setdefault("prefix_weight", self._pw)
        return distance(self._q(s2), s2, **kw)

    def normalized_similarity(self, s2, **kw):
        return self.similarity(s2, **kw)

    def normalized_distance(self, s2, **kw):
        return self.distance(s2, **kw)

    def similarity_with_args(self, s2, args: Args):
        return similarity(self._q(s2), s2, prefix_weight=args.prefix_weight_,
                          score_cutoff=args.cutoff)

    def distance_with_args(self, s2, args: Args):
        return distance(self._q(s2), s2, prefix_weight=args.prefix_weight_,
                        score_cutoff=args.cutoff)

    def normalized_similarity_with_args(self, s2, args: Args):
        return self.similarity_with_args(s2, args)

    def normalized_distance_with_args(self, s2, args: Args):
        return self.distance_with_args(s2, args)

    def similarities(self, corpus, *, score_cutoff=None):
        return similarity_many([self._u1], corpus, prefix_weight=self._pw,
                               score_cutoff=score_cutoff)

    def distances(self, corpus, *, score_cutoff=None):
        return distance_many([self._u1], corpus, prefix_weight=self._pw,
                             score_cutoff=score_cutoff)

    # f64 metric: normalized == raw (maximum is 1.0)
    normalized_similarities = similarities
    normalized_distances = distances


# C vectorcall entry points (native/rf_scalar.cpp FastMetric, id 9 —
# understands the prefix_weight keyword): the str/bytes one-shot runs
# without Python frames; other inputs fall back to the closures above.
_mkfn = getattr(_oracle.fast_scalar(), "make_metric_fn", None)
if _mkfn is not None:
    __test__ = {}

    def _cwrap(fn, kind):
        w = _mkfn(9, kind, 0, fn)
        w.__doc__ = fn.__doc__
        w.__name__ = fn.__name__
        w.__qualname__ = fn.__qualname__
        w.__module__ = fn.__module__
        if fn.__doc__:
            __test__[f"jaro_winkler.{fn.__name__}"] = fn.__doc__
        return w

    distance = _cwrap(distance, 0)
    similarity = _cwrap(similarity, 1)
    normalized_distance = _cwrap(normalized_distance, 2)
    normalized_similarity = _cwrap(normalized_similarity, 3)
    del _cwrap
