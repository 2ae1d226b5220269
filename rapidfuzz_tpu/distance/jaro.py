"""Jaro similarity (``/root/reference/src/distance/jaro.rs``).

f64 metric with ``maximum = 1.0`` (``jaro.rs:602-605``); distance derives
as ``1.0 - similarity``.  The device kernel returns integer (common,
transposition) components; the final similarity
(``jaro.rs:106-119``) is evaluated host-side in f64 so batch results are
bit-identical to the scalar oracle.
"""

from __future__ import annotations

import numpy as np

from .. import common as _c
from .. import oracle as _oracle
from ..ops import dispatch as _dispatch
from ..ops import jaro as _ops
from ..utils import codec as _codec


class Args(_c.ArgsBase):
    pass


def maximum(len1=None, len2=None) -> float:
    return 1.0


def _sim_scalar(s1, s2) -> float:
    if type(s1) in (str, bytes) and type(s2) in (str, bytes):
        fast = _oracle.fast_scalar()
        if fast is not None:
            return fast.jaro(s1, s2)    # in-process C one-shot path
    u1, u2 = _codec.encode_one(s1), _codec.encode_one(s2)
    return _oracle.jaro(u1, u2)


def similarity(s1, s2, *, score_cutoff=None, score_hint=None):
    """Jaro similarity in [0, 1].

    >>> from rapidfuzz_tpu.distance import jaro
    >>> round(jaro.similarity("martha", "marhta"), 4)
    0.9444
    >>> jaro.similarity("martha", "marhta", score_cutoff=0.99) is None
    True
    """
    return _c.apply_similarity_cutoff(_sim_scalar(s1, s2), score_cutoff)


def distance(s1, s2, *, score_cutoff=None, score_hint=None):
    """Jaro distance (``1.0 - similarity``).

    >>> from rapidfuzz_tpu.distance import jaro
    >>> round(jaro.distance("martha", "marhta"), 4)
    0.0556
    """
    return _c.apply_distance_cutoff(1.0 - _sim_scalar(s1, s2), score_cutoff)


def normalized_similarity(s1, s2, *, score_cutoff=None, score_hint=None):
    return similarity(s1, s2, score_cutoff=score_cutoff)


def normalized_distance(s1, s2, *, score_cutoff=None, score_hint=None):
    return distance(s1, s2, score_cutoff=score_cutoff)


def similarity_with_args(s1, s2, args: Args):
    return similarity(s1, s2, score_cutoff=args.cutoff)


def distance_with_args(s1, s2, args: Args):
    return distance(s1, s2, score_cutoff=args.cutoff)


def normalized_similarity_with_args(s1, s2, args: Args):
    return similarity(s1, s2, score_cutoff=args.cutoff)


def normalized_distance_with_args(s1, s2, args: Args):
    return distance(s1, s2, score_cutoff=args.cutoff)


def sim_from_components(common, trans, l1, l2) -> np.ndarray:
    """Exact f64 Jaro similarity from integer kernel components
    (``jaro.rs:106-119`` + the empty special cases ``jaro.rs:442-444``)."""
    common = common.astype(np.float64)
    t = (trans // 2).astype(np.float64)
    l1 = l1.astype(np.float64)
    l2 = l2.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (common / l1 + common / l2 + (common - t) / common) / 3.0
    sim = np.where(common == 0, 0.0, sim)
    sim = np.where((l1 == 0) & (l2 == 0), 1.0, sim)
    return sim


def _sim_batch(s1s, s2s) -> np.ndarray:
    from . import _int_metric
    if len(s1s) == 1 and len(s2s) >= _int_metric.SCAN_MIN:
        # Pallas corpus scan for large one-vs-many batches; the scanner
        # yields f64 distance = 1 - sim, so sims below 0.5 may round one
        # ulp differently from the direct path (well inside the
        # reference's 1e-4 tolerance)
        d = _int_metric.scan_one_vs_many("jaro", s1s[0], s2s)
        if d is not None:
            return 1.0 - d
    c1, l1, c2, l2 = _codec.encode_pair_batch(s1s, s2s)
    fn = _dispatch.jit_kernel(_ops.jaro_components)
    common, trans = (np.asarray(x) for x in fn(c1, l1, c2, l2))
    B = common.shape[0]
    l1b = np.broadcast_to(l1, (B,))
    l2b = np.broadcast_to(l2, (B,))
    return sim_from_components(common, trans, l1b, l2b)


def similarity_many(s1s, s2s, *, score_cutoff=None) -> _dispatch.BatchResult:
    return _dispatch.BatchResult(
        *_c.mask_similarity(_sim_batch(s1s, s2s), score_cutoff))


def distance_many(s1s, s2s, *, score_cutoff=None) -> _dispatch.BatchResult:
    return _dispatch.BatchResult(
        *_c.mask_distance(1.0 - _sim_batch(s1s, s2s), score_cutoff))


normalized_similarity_many = similarity_many
normalized_distance_many = distance_many


class BatchComparator:
    def __init__(self, s1):
        # keep str/bytes queries for the C one-shot route (the
        # reference's BatchComparator is its fastest scalar path)
        self._s1 = s1 if type(s1) in (str, bytes) else None
        self._u1 = _codec.encode_one(s1)

    def _q(self, s2):
        return (self._s1 if self._s1 is not None
                and type(s2) in (str, bytes) else self._u1)

    def similarity(self, s2, **kw):
        return similarity(self._q(s2), s2, **kw)

    def distance(self, s2, **kw):
        return distance(self._q(s2), s2, **kw)

    def normalized_similarity(self, s2, **kw):
        return similarity(self._q(s2), s2, **kw)

    def normalized_distance(self, s2, **kw):
        return distance(self._q(s2), s2, **kw)

    def similarity_with_args(self, s2, args: Args):
        return similarity(self._q(s2), s2, score_cutoff=args.cutoff)

    def distance_with_args(self, s2, args: Args):
        return distance(self._q(s2), s2, score_cutoff=args.cutoff)

    def normalized_similarity_with_args(self, s2, args: Args):
        return similarity(self._q(s2), s2, score_cutoff=args.cutoff)

    def normalized_distance_with_args(self, s2, args: Args):
        return distance(self._q(s2), s2, score_cutoff=args.cutoff)

    def similarities(self, corpus, *, score_cutoff=None):
        return similarity_many([self._u1], corpus, score_cutoff=score_cutoff)

    def distances(self, corpus, *, score_cutoff=None):
        return distance_many([self._u1], corpus, score_cutoff=score_cutoff)

    # f64 metric: normalized == raw (maximum is 1.0)
    normalized_similarities = similarities
    normalized_distances = distances


# C vectorcall entry points (native/rf_scalar.cpp FastMetric, id 8): the
# str/bytes one-shot runs without Python frames; other inputs fall back
# to the closures above.  Doc examples stay tested via __test__.
_mkfn = getattr(_oracle.fast_scalar(), "make_metric_fn", None)
if _mkfn is not None:
    __test__ = {}

    def _cwrap(fn, kind):
        w = _mkfn(8, kind, 0, fn)
        w.__doc__ = fn.__doc__
        w.__name__ = fn.__name__
        w.__qualname__ = fn.__qualname__
        w.__module__ = fn.__module__
        if fn.__doc__:
            __test__[f"jaro.{fn.__name__}"] = fn.__doc__
        return w

    distance = _cwrap(distance, 0)
    similarity = _cwrap(similarity, 1)
    normalized_distance = _cwrap(normalized_distance, 2)
    normalized_similarity = _cwrap(normalized_similarity, 3)
    del _cwrap
