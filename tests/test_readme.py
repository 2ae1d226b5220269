"""Executable README quick-start — the analogue of the reference's doc
tests (every public fn carries runnable examples, ``lib.rs:28-72``)."""

import numpy as np
import pytest


def test_quick_start():
    from rapidfuzz_tpu.distance import levenshtein, jaro_winkler
    from rapidfuzz_tpu import fuzz

    assert levenshtein.distance("kitten", "sitting") == 3
    assert levenshtein.distance("kitten", "sitting", score_cutoff=2) is None
    assert levenshtein.distance(
        "kitten", "sitting",
        weights=levenshtein.WeightTable(1, 1, 2)) == 5
    assert jaro_winkler.similarity("charles", "charlie") == pytest.approx(
        0.942857, abs=1e-4)
    assert fuzz.ratio("this is a test", "this is a test!") == pytest.approx(
        0.9655, abs=1e-4)

    bc = levenshtein.BatchComparator("kitten")
    assert bc.distances(["sitting", "mitten", "kitchen"]).values.tolist() \
        == [3, 1, 2]

    assert levenshtein.distance_many(
        ["kitten", "abc"], ["sitting", "abd"]).values.tolist() == [3, 1]

    from rapidfuzz_tpu.parallel import CorpusScanner
    corpus_list = ["sitting", "mitten", "kitchen", "apple"]
    sc = CorpusScanner(corpus_list, metric="levenshtein")
    assert sc.distances("kitten").tolist() == [3, 1, 2, 5]
    vals, ids = sc.topk("kitten", k=2)
    assert list(vals) == [1, 2] and corpus_list[ids[0]] == "mitten"

    from rapidfuzz_tpu.models import extract, cdist
    top = extract("kitten", corpus_list, limit=2)
    assert top[0][0] == "mitten"
    m = cdist(["kitten"], corpus_list, scorer="jaro_winkler")
    assert m.values.shape == (1, 4)


def test_args_builders():
    """Builder-style Args mirror the reference typestates."""
    from rapidfuzz_tpu.distance import levenshtein, jaro_winkler, hamming

    args = levenshtein.Args().score_cutoff(2).score_hint(5)
    assert levenshtein.distance_with_args("kitten", "sitting", args) is None
    args = levenshtein.Args().weights(levenshtein.WeightTable(1, 1, 2))
    assert levenshtein.distance_with_args("kitten", "sitting", args) == 5
    args = jaro_winkler.Args().prefix_weight(0.2)
    assert jaro_winkler.similarity_with_args("charles", "charlie", args) \
        == jaro_winkler.similarity("charles", "charlie", prefix_weight=0.2)
    args = hamming.Args().pad(True)
    assert hamming.distance_with_args("ham", "hamming", args) == 4
