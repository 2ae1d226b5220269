"""process-style drivers: extract / extract_one / cdist.

All scorers are the metric modules themselves (``scorer=levenshtein`` or a
string name); scores follow the scorer's ``normalized_similarity`` unless
``score_kind`` selects another of the four kinds.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .. import common as _c
from ..distance import (damerau_levenshtein, hamming, indel, jaro,
                        jaro_winkler, lcs_seq, levenshtein, osa, postfix,
                        prefix)
from ..ops import dispatch as _dispatch
from ..utils import codec as _codec

_SCORERS = {
    "levenshtein": levenshtein,
    "ratio": indel,      # fuzz.ratio == indel normalized_similarity
    "indel": indel,
    "lcs_seq": lcs_seq,
    "osa": osa,
    "damerau_levenshtein": damerau_levenshtein,
    "hamming": hamming,
    "jaro": jaro,
    "jaro_winkler": jaro_winkler,
    "prefix": prefix,
    "postfix": postfix,
}


def _fuzz_scorers():
    from .. import fuzz
    return {
        "partial_ratio": fuzz.partial_ratio,
        "token_sort_ratio": fuzz.token_sort_ratio,
        "token_set_ratio": fuzz.token_set_ratio,
        "token_ratio": fuzz.token_ratio,
        "partial_token_sort_ratio": fuzz.partial_token_sort_ratio,
        "partial_token_set_ratio": fuzz.partial_token_set_ratio,
        "partial_token_ratio": fuzz.partial_token_ratio,
        "WRatio": fuzz.WRatio,
        "QRatio": fuzz.QRatio,
    }


def _fuzz_many(scorer):
    """One-vs-many batch form of a fuzz scorer — only when the scorer IS
    the fuzz module's own function (a user callable that merely shares a
    name must keep being called pairwise)."""
    from .. import fuzz
    name = scorer if isinstance(scorer, str) else getattr(
        scorer, "__name__", None)
    if not name:
        return None
    if not isinstance(scorer, str) and getattr(fuzz, name, None) is not scorer:
        return None
    return getattr(fuzz, f"{name}_many", None)


def _resolve(scorer):
    if isinstance(scorer, str):
        mod = _SCORERS.get(scorer)
        return mod if mod is not None else _fuzz_scorers()[scorer]
    return scorer


def _pairwise_scores(scorer, queries: Sequence, choices: Sequence,
                     score_kind: str) -> np.ndarray:
    """Score matrix [len(queries), len(choices)] via broadcastable batches."""
    mod = _resolve(scorer)
    nq, nc = len(queries), len(choices)
    out = np.empty((nq, nc), np.float64)
    if callable(mod) and not hasattr(mod, "normalized_similarity_many"):
        # scalar similarity scorer (the fuzz.* family): [0, 1] similarities
        if score_kind != "normalized_similarity":
            raise ValueError(
                f"scorer {getattr(mod, '__name__', mod)!r} only yields "
                "normalized_similarity")
        many = _fuzz_many(scorer if isinstance(scorer, str) else mod)
        for qi, q in enumerate(queries):
            if many is not None:
                out[qi] = many(q, choices).values
            else:
                for ci, c in enumerate(choices):
                    out[qi, ci] = mod(q, c)
        return out
    many = {
        "normalized_similarity": getattr(mod, "normalized_similarity_many",
                                         None),
        "normalized_distance": getattr(mod, "normalized_distance_many", None),
        "similarity": getattr(mod, "similarity_many", None),
        "distance": getattr(mod, "distance_many", None),
    }[score_kind]
    if many is None:
        raise ValueError(f"{mod} does not support {score_kind}")
    for qi, q in enumerate(queries):
        out[qi] = many([q], choices).values
    return out


#: Metrics whose many-vs-many path can run through a device-resident
#: CorpusScanner (one corpus layout + compiled scan amortized over all
#: queries — the many-vs-many analogue of the BatchComparator cache).
#: hamming is excluded: the scanner uses padding semantics while the
#: process API inherits the strict length check.
_SCANNER_METRICS = frozenset({
    "levenshtein", "indel", "lcs_seq", "osa", "damerau_levenshtein",
    "jaro", "jaro_winkler", "prefix", "postfix", "partial_ratio",
})


def _scanner_scores(name: str, queries: Sequence, choices: Sequence,
                    score_kind: str, scanner=None,
                    score_cutoff=None) -> np.ndarray:
    from ..parallel.scan import CorpusScanner

    if scanner is None:
        lens = np.array([len(_codec.encode_one(c)) for c in choices],
                        np.int64)
        # extreme length spread: one outlier would inflate every kernel
        # tile's bucket (or force the stream kernels), so split into
        # per-length-class scanners when the classes are big enough
        if (lens.size >= 8192
                and lens.max(initial=0) >= 4 * max(np.median(lens), 1)
                and lens.max(initial=0) > 64):
            from ..parallel.bucketed import BucketedScanner
            scanner = BucketedScanner(choices, metric=name)
        else:
            scanner = CorpusScanner(choices, metric=name)
    lens2 = scanner.lengths.astype(np.int64)
    out = np.empty((len(queries), len(choices)), np.float64)
    # a caller cutoff converts to an over-covering DISTANCE bound and
    # rides the scanner's banded device kernels (indel.rs:80-104 /
    # levenshtein.rs:509-617 routes); entries the band rejects come back
    # with distance overestimates, so the final score mask in cdist/
    # extract filters exactly the true set
    push = (score_cutoff is not None
            and name in ("levenshtein", "indel", "lcs_seq"))
    maxlen = int(lens2.max(initial=0))
    # eligible query batches share grouped multi-query kernel dispatches
    # (scan_many packs 16 queries per dispatch); others scan one by one
    dmat = (np.asarray(scanner.scan_many(queries))
            if len(queries) > 1 and scanner._nq_eligible() and not push
            else None)
    for qi, q in enumerate(queries):
        dcut = None
        if push and dmat is None:
            l1q = _codec.encode_one(q).size
            mx_max = l1q + maxlen if name == "indel" else max(l1q, maxlen)
            if score_kind == "distance":
                dcut = int(score_cutoff)
            elif score_kind == "similarity":
                dcut = max(mx_max - int(score_cutoff), 0)
            elif score_kind == "normalized_distance":
                dcut = int(score_cutoff * mx_max) + 1
            else:
                dcut = int((1.0 - score_cutoff) * mx_max) + 1
        if dmat is not None:
            d = dmat[qi]
        elif dcut is not None:
            d = np.asarray(
                scanner.distances(q, score_cutoff=dcut).values)
        else:
            d = np.asarray(scanner.distances(q))
        if name in ("jaro", "jaro_winkler", "partial_ratio"):
            # scanner yields f64 distance = 1 - similarity; maximum = 1.0
            out[qi] = 1.0 - d if score_kind.endswith("similarity") else d
            continue
        l1 = _codec.encode_one(q).size
        if name == "indel":
            mx = l1 + lens2
        else:
            mx = np.maximum(l1, lens2)
        if score_kind == "distance":
            out[qi] = d
        elif score_kind == "similarity":
            out[qi] = mx - d
        else:
            nd = np.where(mx == 0, 0.0, d / np.maximum(mx, 1))
            out[qi] = nd if score_kind == "normalized_distance" else 1.0 - nd
    return out


def cdist(queries: Sequence, choices: Sequence, *, scorer="levenshtein",
          score_kind: str = "normalized_similarity",
          score_cutoff: Optional[float] = None, processor=None,
          _scanner=None):
    """Many-vs-many score matrix (+ validity mask under a cutoff).

    ``processor`` (a callable, e.g. ``fuzz.default_process``) is applied
    to every query and choice before scoring.  ``_scanner`` lets a caller
    that already holds a device-resident :class:`CorpusScanner` over
    ``choices`` (the serving layer) reuse it instead of rebuilding one.

    With a ``score_cutoff``, the cutoff is pushed into the scan as a
    banded-kernel bound: masked (invalid) entries are only guaranteed to
    FAIL the cutoff — their ``values`` may be score underestimates (the
    reference's Option-None contract; valid entries are always exact).

    >>> from rapidfuzz_tpu.models import cdist
    >>> cdist(["kitten"], ["mitten", "kitty"], scorer="levenshtein",
    ...       score_kind="distance").values.tolist()
    [[1.0, 2.0]]
    """
    queries, choices = list(queries), list(choices)
    if processor is not None:
        queries = [processor(q) for q in queries]
        choices = [processor(c) for c in choices]
    if scorer == "ratio":
        scorer = "indel"    # fuzz.ratio == indel normalized_similarity
    if (isinstance(scorer, str) and scorer in _SCANNER_METRICS
            and (len(choices) >= 2 or _scanner is not None)):
        scores = _scanner_scores(scorer, queries, choices, score_kind,
                                 scanner=_scanner,
                                 score_cutoff=score_cutoff)
    else:
        scores = _pairwise_scores(scorer, queries, choices, score_kind)
    if score_cutoff is None:
        valid = np.ones_like(scores, bool)
    elif score_kind.endswith("distance"):
        valid = scores <= score_cutoff
    else:
        valid = scores >= score_cutoff
    return _dispatch.BatchResult(scores, valid)


def extract(query, choices: Sequence, *, scorer="levenshtein",
            score_kind: str = "normalized_similarity", limit: int = 5,
            score_cutoff: Optional[float] = None, processor=None,
            _scanner=None):
    """Best ``limit`` choices as (choice, score, index), best first.

    >>> from rapidfuzz_tpu.models import extract
    >>> [(c, round(s, 4), i) for c, s, i in
    ...  extract("kitten", ["sitting", "mitten", "kitchen"], limit=2)]
    [('mitten', 0.8333, 1), ('kitchen', 0.7143, 2)]
    """
    choices = list(choices)
    scores = cdist([query], choices, scorer=scorer,
                   score_kind=score_kind, processor=processor,
                   score_cutoff=score_cutoff,
                   _scanner=_scanner).values[0]
    descending = not score_kind.endswith("distance")
    order = np.argsort(-scores if descending else scores, kind="stable")
    out = []
    for idx in order[:limit] if limit else order:
        s = scores[idx]
        if score_cutoff is not None:
            if descending and s < score_cutoff:
                continue
            if not descending and s > score_cutoff:
                continue
        out.append((choices[idx], float(s), int(idx)))
    return out


def extract_one(query, choices: Sequence, **kw):
    res = extract(query, choices, limit=1, **kw)
    return res[0] if res else None


#: scorers whose alignment the recording kernels can reconstruct
_EDITOPS_SCORERS = {
    "levenshtein": "levenshtein", "indel": "lcs", "lcs_seq": "lcs",
    "ratio": "lcs",
}


def extract_editops(query, choices: Sequence, *, scorer="levenshtein",
                    score_kind: str = "normalized_similarity",
                    limit: int = 5, score_cutoff: Optional[float] = None,
                    processor=None, _scanner=None):
    """:func:`extract`, plus the edit script for every returned hit:
    ``(choice, score, index, Editops)`` tuples, best first.

    Two device phases: the ranking scan (same as ``extract``), then ONE
    batched bit-row recording dispatch over just the surviving ``limit``
    hits (``distance/_editops.py:levenshtein_editops_many``) — alignments
    cost a single extra kernel call, not one per hit.  Supported scorers:
    levenshtein (replace/insert/delete scripts), indel / lcs_seq / ratio
    (insert/delete scripts).
    """
    kind = _EDITOPS_SCORERS.get(scorer if isinstance(scorer, str) else "")
    if kind is None:
        raise ValueError(
            f"scorer {scorer!r} has no alignment form; pick one of "
            f"{sorted(_EDITOPS_SCORERS)}")
    hits = extract(query, choices, scorer=scorer, score_kind=score_kind,
                   limit=limit, score_cutoff=score_cutoff,
                   processor=processor, _scanner=_scanner)
    if not hits:
        return []
    from ..distance._editops import (lcs_editops_many,
                                     levenshtein_editops_many)
    q = processor(query) if processor is not None else query
    docs = [processor(h[0]) if processor is not None else h[0] for h in hits]
    many = (levenshtein_editops_many if kind == "levenshtein"
            else lcs_editops_many)
    ops = many(q, docs)
    return [(c, s, i, o) for (c, s, i), o in zip(hits, ops)]


def extract_iter(query, choices: Sequence, *, scorer="levenshtein",
                 score_kind: str = "normalized_similarity",
                 score_cutoff: Optional[float] = None, processor=None):
    """Yield ``(choice, score, index)`` in CHOICE order (not ranked),
    skipping cutoff-filtered entries — the ecosystem's lazy variant.
    Scores are computed in one batch up front (the device path), so this
    is an ordering/filtering convenience, not a streaming evaluator."""
    choices = list(choices)
    res = cdist([query], choices, scorer=scorer, score_kind=score_kind,
                score_cutoff=score_cutoff, processor=processor)
    for i, (v, ok) in enumerate(zip(res.values[0], res.valid[0])):
        if ok:
            yield (choices[i], float(v), i)
