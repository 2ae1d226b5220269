"""Long-sequence exactness fixture (``levenshtein.rs:2139-2161``):
106,514 vs 107,244 byte OCR arrays -> distance 5,278; cutoff 2500 -> None;
score_hint 0 still exact.
"""

import os

import numpy as np
import pytest

from rapidfuzz_tpu.distance import levenshtein as lev

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "ocr.npz")


@pytest.fixture(scope="module")
def ocr():
    d = np.load(FIX)
    return d["ex1"].astype(np.int64), d["ex2"].astype(np.int64)


def test_large_band(ocr):
    a, b = ocr
    assert a.size == 106514 and b.size == 107244
    assert lev.distance(a, b) == 5278
    assert lev.distance(a, b, score_cutoff=2500) is None
    assert lev.distance(a, b, score_hint=0) == 5278
