"""``fuzz`` family (``/root/reference/src/fuzz.rs``).

Only ``ratio`` exists in the reference crate (``fuzz.rs:207-213`` notes the
other C++/Python rapidfuzz scorers are absent); ``ratio`` is indel
normalized similarity in ``[0.0, 1.0]`` (``fuzz.rs:60-85``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import common as _c
from . import oracle as _oracle
from .ops import dispatch as _dispatch
from .utils import codec as _codec


class Args(_c.ArgsBase):
    pass


def ratio(s1, s2, *, score_cutoff: Optional[float] = None,
          score_hint: Optional[float] = None) -> Optional[float]:
    """Indel-based normalized similarity in [0, 1] (``fuzz.rs:48-85``).

    >>> from rapidfuzz_tpu import fuzz
    >>> round(fuzz.ratio("this is a test", "this is a test!"), 4)
    0.9655
    >>> fuzz.ratio("this is a test", "this is a test!",
    ...            score_cutoff=0.99) is None
    True
    """
    u1, u2 = _codec.encode_one(s1), _codec.encode_one(s2)
    mx = u1.size + u2.size
    dist = _oracle.indel(u1, u2)
    sim = 1.0 - _c.norm_dist_from_dist(dist, mx)
    return _c.apply_similarity_cutoff(sim, score_cutoff)


def ratio_with_args(s1, s2, args: Args):
    return ratio(s1, s2, score_cutoff=args.cutoff, score_hint=args.hint)


class RatioBatchComparator:
    """One-vs-many ``ratio`` (``fuzz.rs:98-150``)."""

    def __init__(self, s1):
        self._u1 = _codec.encode_one(s1)

    def similarity(self, s2, *, score_cutoff=None, score_hint=None):
        return ratio(self._u1, s2, score_cutoff=score_cutoff,
                     score_hint=score_hint)

    def similarity_with_args(self, s2, args: Args):
        return ratio(self._u1, s2, score_cutoff=args.cutoff,
                     score_hint=args.hint)

    def similarities(self, corpus, *, score_cutoff=None
                     ) -> _dispatch.BatchResult:
        from .ops import lcs as _lcs_ops
        c1, l1, c2, l2 = _codec.encode_pair_batch([self._u1], corpus)
        sim = _dispatch.run_pairs(_lcs_ops.lcs_similarity, c1, l1, c2, l2)
        mx = (l1.astype(np.int64) + l2.astype(np.int64))
        dist = mx - 2 * sim.astype(np.int64)
        nsim = 1.0 - np.where(mx == 0, 0.0, dist / np.maximum(mx, 1))
        return _dispatch.BatchResult(*_c.mask_similarity(nsim, score_cutoff))
